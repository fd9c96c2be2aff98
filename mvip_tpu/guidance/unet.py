"""Conditional UNet for latent-diffusion inpainting — pure JAX, NHWC.

Capability parity with the 9-channel diffusers `UNet2DConditionModel` the
reference drives for all three SDS variants (`DS_NeRF/guidance/sd_utils.py:
394-403`): input = [noisy latents (4) | downsampled mask (1) | masked-image
latents (4)], conditioned on a CLIP text embedding via cross-attention, output
= predicted noise (4).

The UNet is FROZEN in SDS (`sd_utils.py:390` no_grad) — forward only, so the
implementation favors straight-line inference: bf16-friendly matmuls, NHWC convs,
`lax`-free Python structure (everything static, trace-once under jit).

Architecture is SD-1.x checkpoint-compatible via `weights.py`:
conv_in -> [N resnet(+cross-attn transformer)] stages with stride-2 downsamples
-> mid (resnet, transformer, resnet) -> mirrored up stages consuming skip
connections -> GN/silu -> conv_out.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from mvip_tpu.guidance.layers import (
    Params,
    attn_init,
    attention,
    conv2d,
    conv_init,
    group_norm,
    layer_norm,
    linear,
    linear_init,
    norm_init,
    silu,
    timestep_embedding,
    upsample_nearest_2x,
)


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 9          # latents 4 + mask 1 + masked latents 4
    out_channels: int = 4
    block_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    cross_attn: Tuple[bool, ...] = (True, True, True, False)  # per down stage
    layers_per_block: int = 2
    heads: int = 8
    cross_attention_dim: int = 768
    norm_groups: int = 32
    time_embed_mult: int = 4      # time_embed_dim = block_channels[0] * 4

    @property
    def time_embed_dim(self) -> int:
        return self.block_channels[0] * self.time_embed_mult


def tiny_unet_config() -> UNetConfig:
    return UNetConfig(
        block_channels=(8, 16),
        cross_attn=(True, False),
        layers_per_block=1,
        heads=2,
        cross_attention_dim=8,
        norm_groups=4,
    )


# --- blocks --------------------------------------------------------------------


def _resnet_init(key, c_in, c_out, temb_dim, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "norm1": norm_init(c_in, dtype),
        "conv1": conv_init(k1, 3, 3, c_in, c_out, dtype),
        "temb": linear_init(k2, temb_dim, c_out, dtype),
        "norm2": norm_init(c_out, dtype),
        "conv2": conv_init(k3, 3, 3, c_out, c_out, dtype),
    }
    if c_in != c_out:
        p["shortcut"] = conv_init(k4, 1, 1, c_in, c_out, dtype)
    return p


def _resnet(p: Params, x, temb, groups: int):
    h = conv2d(p["conv1"], silu(group_norm(p["norm1"], x, groups)))
    h = h + linear(p["temb"], silu(temb))[:, None, None, :]
    h = conv2d(p["conv2"], silu(group_norm(p["norm2"], h, groups)))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x)
    return x + h


def _transformer_init(key, c, heads, ctx_dim, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    dim_head = c // heads
    return {
        "norm": norm_init(c, dtype),
        "proj_in": conv_init(ks[0], 1, 1, c, c, dtype),
        "ln1": norm_init(c, dtype),
        "attn1": attn_init(ks[1], c, heads, dim_head, dtype=dtype),
        "ln2": norm_init(c, dtype),
        "attn2": attn_init(ks[2], c, heads, dim_head, context_dim=ctx_dim, dtype=dtype),
        "ln3": norm_init(c, dtype),
        "ff1": linear_init(ks[3], c, 8 * c, dtype),   # geglu: 4c value + 4c gate
        "ff2": linear_init(ks[4], 4 * c, c, dtype),
        "proj_out": conv_init(ks[5], 1, 1, c, c, dtype),
    }


def _transformer(p: Params, x, context, heads: int, groups: int):
    """Spatial transformer: self-attn + cross-attn + GEGLU FF over [H*W] tokens."""
    n, h, w, c = x.shape
    residual = x
    y = group_norm(p["norm"], x, groups, eps=1e-6)
    y = conv2d(p["proj_in"], y).reshape(n, h * w, c)

    y = y + attention(p["attn1"], layer_norm(p["ln1"], y), heads=heads)
    y = y + attention(p["attn2"], layer_norm(p["ln2"], y), context=context, heads=heads)
    f = linear(p["ff1"], layer_norm(p["ln3"], y))
    val, gate = jnp.split(f, 2, axis=-1)
    # exact (erf) gelu: diffusers' GEGLU uses F.gelu, not the tanh approximation
    y = y + linear(p["ff2"], val * jax.nn.gelu(gate, approximate=False))

    return conv2d(p["proj_out"], y.reshape(n, h, w, c)) + residual


# --- init ----------------------------------------------------------------------


def init_unet(key: jax.Array, cfg: UNetConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 512))
    ch = cfg.block_channels
    ted = cfg.time_embed_dim
    p: Dict[str, Any] = {
        "conv_in": conv_init(next(keys), 3, 3, cfg.in_channels, ch[0], dtype),
        "time1": linear_init(next(keys), ch[0], ted, dtype),
        "time2": linear_init(next(keys), ted, ted, dtype),
    }

    # down path; record skip-connection channel counts for the up path
    skip_ch: List[int] = [ch[0]]
    down = []
    c_prev = ch[0]
    for i, c in enumerate(ch):
        stage: Dict[str, Any] = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block):
            stage["resnets"].append(
                _resnet_init(next(keys), c_prev if j == 0 else c, c, ted, dtype)
            )
            if cfg.cross_attn[i]:
                stage["attns"].append(
                    _transformer_init(next(keys), c, cfg.heads, cfg.cross_attention_dim, dtype)
                )
            skip_ch.append(c)
        if i < len(ch) - 1:
            stage["down"] = conv_init(next(keys), 3, 3, c, c, dtype)
            skip_ch.append(c)
        down.append(stage)
        c_prev = c
    p["down"] = down

    p["mid"] = {
        "res1": _resnet_init(next(keys), ch[-1], ch[-1], ted, dtype),
        "attn": _transformer_init(next(keys), ch[-1], cfg.heads, cfg.cross_attention_dim, dtype),
        "res2": _resnet_init(next(keys), ch[-1], ch[-1], ted, dtype),
    }

    # up path (mirrored; each stage consumes layers_per_block+1 skips)
    up = []
    c_prev = ch[-1]
    for i, c in enumerate(reversed(ch)):
        ridx = len(ch) - 1 - i
        stage = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block + 1):
            c_skip = skip_ch.pop()
            c_in = (c_prev if j == 0 else c) + c_skip
            stage["resnets"].append(_resnet_init(next(keys), c_in, c, ted, dtype))
            if cfg.cross_attn[ridx]:
                stage["attns"].append(
                    _transformer_init(next(keys), c, cfg.heads, cfg.cross_attention_dim, dtype)
                )
        if i < len(ch) - 1:
            stage["up"] = conv_init(next(keys), 3, 3, c, c, dtype)
        up.append(stage)
        c_prev = c
    p["up"] = up

    p["norm_out"] = norm_init(ch[0], dtype)
    p["conv_out"] = conv_init(next(keys), 3, 3, ch[0], cfg.out_channels, dtype)
    return p


# --- apply ----------------------------------------------------------------------


def apply_unet(
    params: Dict[str, Any],
    cfg: UNetConfig,
    x: jnp.ndarray,        # [B, H, W, in_channels]
    t: jnp.ndarray,        # scalar or [B]
    context: jnp.ndarray,  # [B, T, cross_attention_dim]
    compute_dtype=None,
) -> jnp.ndarray:
    if compute_dtype is not None:
        params = jax.tree.map(lambda a: a.astype(compute_dtype), params)
        x = x.astype(compute_dtype)
        context = context.astype(compute_dtype)
    g, heads = cfg.norm_groups, cfg.heads

    temb = timestep_embedding(jnp.broadcast_to(jnp.atleast_1d(t), (x.shape[0],)),
                              cfg.block_channels[0])
    temb = linear(params["time2"], silu(linear(params["time1"], temb.astype(x.dtype))))

    h = conv2d(params["conv_in"], x)
    skips = [h]
    for i, stage in enumerate(params["down"]):
        for j, rp in enumerate(stage["resnets"]):
            h = _resnet(rp, h, temb, g)
            if stage["attns"]:
                h = _transformer(stage["attns"][j], h, context, heads, g)
            skips.append(h)
        if "down" in stage:
            h = conv2d(stage["down"], h, stride=2)
            skips.append(h)

    mid = params["mid"]
    h = _resnet(mid["res1"], h, temb, g)
    h = _transformer(mid["attn"], h, context, heads, g)
    h = _resnet(mid["res2"], h, temb, g)

    for stage in params["up"]:
        for j, rp in enumerate(stage["resnets"]):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = _resnet(rp, h, temb, g)
            if stage["attns"]:
                h = _transformer(stage["attns"][j], h, context, heads, g)
        if "up" in stage:
            h = conv2d(stage["up"], upsample_nearest_2x(h))

    h = silu(group_norm(params["norm_out"], h, g))
    return conv2d(params["conv_out"], h).astype(jnp.float32)
