"""Classic positional-encoding NeRF MLP.

Capability parity with `NeRF` (`DS_NeRF/run_nerf_helpers.py:74-156`): D=8 layers of
width W=256 with a skip connection re-injecting the encoded position at layer 4, a
view-direction branch of width W/2, heads for sigma (1) and rgb (3). With
`use_viewdirs=False` a single (W -> 4) output head.

TPU-first: plain pytree params + a pure apply function. Points arrive as a flat
[N, Cpos] matrix so every layer is one MXU matmul; weights are stored [in, out]
(row-major activations · weights), fp32 params with optional bf16 compute.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mvip_tpu.ops.embed import embedding_dim, positional_encoding


@dataclass(frozen=True)
class NeRFMLPConfig:
    depth: int = 8
    width: int = 256
    skips: tuple = (4,)
    use_viewdirs: bool = True
    multires: int = 10        # positional-encoding bands for position
    multires_views: int = 4   # bands for view direction
    output_ch: int = 4        # only used when use_viewdirs=False

    @property
    def input_ch(self) -> int:
        return embedding_dim(3, self.multires)

    @property
    def input_ch_views(self) -> int:
        return embedding_dim(3, self.multires_views)


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=√5) weights, ±1/√fan_in bias."""
    kw, kb = jax.random.split(key)
    bound_w = math.sqrt(3.0) * math.sqrt(2.0 / (1.0 + 5.0)) / math.sqrt(fan_in)
    bound_b = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound_w, bound_w)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound_b, bound_b)
    return {"w": w, "b": b}


def init_nerf_mlp(key: jax.Array, cfg: NeRFMLPConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, cfg.depth + 5))
    params: Dict[str, Any] = {"pts": []}
    in_ch = cfg.input_ch
    for i in range(cfg.depth):
        fan_in = in_ch if i == 0 else (
            cfg.width + cfg.input_ch if (i - 1) in cfg.skips else cfg.width
        )
        params["pts"].append(_linear_init(next(keys), fan_in, cfg.width, dtype))
    if cfg.use_viewdirs:
        params["feature"] = _linear_init(next(keys), cfg.width, cfg.width, dtype)
        params["alpha"] = _linear_init(next(keys), cfg.width, 1, dtype)
        params["views"] = _linear_init(
            next(keys), cfg.width + cfg.input_ch_views, cfg.width // 2, dtype
        )
        params["rgb"] = _linear_init(next(keys), cfg.width // 2, 3, dtype)
    else:
        params["output"] = _linear_init(next(keys), cfg.width, cfg.output_ch, dtype)
    return params


def _dense(p, x, compute_dtype=None):
    w, b = p["w"], p["b"]
    if compute_dtype is not None:
        x, w = x.astype(compute_dtype), w.astype(compute_dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32) + b


def apply_nerf_mlp(
    params: Dict[str, Any],
    cfg: NeRFMLPConfig,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """pts [..., 3] raw positions, viewdirs [..., 3] unit view directions
    (broadcast against pts' leading dims). Returns raw [..., 4] = (rgb logits, sigma).
    """
    shape = pts.shape[:-1]
    x = positional_encoding(pts.reshape(-1, 3), cfg.multires)
    h = x
    for i, layer in enumerate(params["pts"]):
        h = jax.nn.relu(_dense(layer, h, compute_dtype))
        if i in cfg.skips:
            h = jnp.concatenate([x, h], -1)

    if cfg.use_viewdirs:
        if viewdirs is None:
            raise ValueError("use_viewdirs=True requires viewdirs")
        v = jnp.broadcast_to(
            viewdirs[..., None, :] if viewdirs.ndim < pts.ndim else viewdirs, pts.shape
        ).reshape(-1, 3)
        v = positional_encoding(v, cfg.multires_views)
        sigma = _dense(params["alpha"], h, compute_dtype)
        feat = _dense(params["feature"], h, compute_dtype)
        h = jnp.concatenate([feat, v], -1)
        h = jax.nn.relu(_dense(params["views"], h, compute_dtype))
        rgb = _dense(params["rgb"], h, compute_dtype)
        raw = jnp.concatenate([rgb, sigma], -1)
    else:
        raw = _dense(params["output"], h, compute_dtype)
    return raw.reshape(*shape, raw.shape[-1])
