"""Native JAX LPIPS (Learned Perceptual Image Patch Similarity).

The reference scores inpainting quality with pyiqa's LPIPS
(`DS_NeRF/evaluation.py:52-54`); this image has neither pyiqa, lpips, nor
torchvision, and zero egress for their pretrained weights. This module
implements the FULL published LPIPS computation natively (Zhang et al. 2018,
the `lpips` package's exact math):

    x -> scaling layer (shift/scale constants) -> VGG16 conv features at
    relu{1_2, 2_2, 3_3, 4_3, 5_3} -> per-layer unit-normalize over channels
    -> squared difference -> learned non-negative 1x1 "lin" weights ->
    spatial mean -> sum over layers

so the only missing piece is the weights file: `load_lpips_weights(path)`
ports a torchvision VGG16 state dict + the lpips package's lin heads the
moment either lands on disk. The computation itself is validated against a
hand-built torch replica at tiny scale in tests/test_torch_parity_fullgraph.py
(the same scheme that validates the UNet/VAE/CLIP graphs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# lpips package ScalingLayer constants (shift/scale of ImageNet-ish stats)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@dataclass(frozen=True)
class LPIPSConfig:
    # VGG16 conv plan: (out_channels, n_convs) per stage; maxpool between
    stages: Tuple[Tuple[int, int], ...] = (
        (64, 2), (128, 2), (256, 3), (512, 3), (512, 3)
    )

    @property
    def tap_channels(self) -> Tuple[int, ...]:
        return tuple(c for c, _ in self.stages)


def tiny_lpips_config() -> LPIPSConfig:
    return LPIPSConfig(stages=((4, 2), (8, 2), (8, 3)))


def init_lpips(key: jax.Array, cfg: LPIPSConfig) -> Dict[str, Any]:
    from mvip_tpu.guidance.layers import conv_init

    keys = iter(jax.random.split(key, 64))
    convs: List[List[Dict]] = []
    c_in = 3
    for c_out, n in cfg.stages:
        stage = []
        for _ in range(n):
            stage.append(conv_init(next(keys), 3, 3, c_in, c_out))
            c_in = c_out
        convs.append(stage)
    lins = [
        {"w": jnp.abs(jax.random.normal(next(keys), (c, 1))) * 0.1}
        for c in cfg.tap_channels
    ]
    return {"convs": convs, "lins": lins}


def _vgg_taps(params, cfg: LPIPSConfig, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x [N, H, W, 3] already scaled -> post-relu features at each stage end."""
    from mvip_tpu.guidance.layers import conv2d

    taps = []
    h = x
    for si, stage in enumerate(params["convs"]):
        if si > 0:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        for p in stage:
            h = jax.nn.relu(conv2d(p, h))
        taps.append(h)
    return taps


def lpips(params, cfg: LPIPSConfig, a: jnp.ndarray, b: jnp.ndarray):
    """a, b [N, H, W, 3] in [-1, 1] -> LPIPS distance [N]."""
    sh = jnp.asarray(_SHIFT)
    sc = jnp.asarray(_SCALE)
    fa = _vgg_taps(params, cfg, (a - sh) / sc)
    fb = _vgg_taps(params, cfg, (b - sh) / sc)
    total = 0.0
    for ta, tb, lin in zip(fa, fb, params["lins"]):
        na = ta * jax.lax.rsqrt(jnp.sum(ta * ta, -1, keepdims=True) + 1e-10)
        nb = tb * jax.lax.rsqrt(jnp.sum(tb * tb, -1, keepdims=True) + 1e-10)
        d2 = (na - nb) ** 2                              # [N, H, W, C]
        # learned 1x1 head (non-negative), then spatial average
        per_px = (d2 @ jnp.maximum(lin["w"], 0.0))[..., 0]
        total = total + jnp.mean(per_px, (1, 2))
    return total


def lpips_mapping(cfg: LPIPSConfig):
    """(torch_name, pytree_path, kind) entries for `guidance.weights` plumbing.

    Torch names follow torchvision `vgg16().features` indices for the conv
    stack and the lpips package's `lin{i}.model.1` for the heads."""
    m = []
    idx = 0
    for si, (c, n) in enumerate(cfg.stages):
        if si > 0:
            idx += 1  # the MaxPool2d slot
        for j in range(n):
            m.append((f"features.{idx}", ("convs", si, j), "conv"))
            idx += 2  # conv + relu
    for i in range(len(cfg.stages)):
        m.append((f"lin{i}.model.1", ("lins", i), "lin1x1"))
    return m


def import_lpips_state(params, sd: Dict[str, np.ndarray], cfg: LPIPSConfig):
    """Fill `params` from a merged torch state dict (VGG16 features + lin
    heads). lin weights arrive as [1, C, 1, 1] conv kernels."""
    from mvip_tpu.guidance.weights import _set

    for name, path, kind in lpips_mapping(cfg):
        if kind == "conv":
            w = np.transpose(np.asarray(sd[f"{name}.weight"]), (2, 3, 1, 0))
            node = params
            for p in path:
                node = node[p]
            node["w"] = w
            node["b"] = np.asarray(sd[f"{name}.bias"])
        else:
            w = np.asarray(sd[f"{name}.weight"])[0, :, 0, 0][:, None]
            _set(params, path + ("w",), w)
    return params


def load_lpips_weights(path: str, cfg: LPIPSConfig = LPIPSConfig()):
    """Port a saved torch state dict (.pt/.bin with vgg features + lin heads)
    into a ready LPIPS pytree — the gated entry point for real weights."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.float().numpy() for k, v in sd.items()}
    params = jax.tree.map(np.asarray, init_lpips(jax.random.PRNGKey(0), cfg))
    return import_lpips_state(params, sd, cfg)
