"""Variational autoencoder (KL) for latent diffusion — pure JAX, NHWC.

Capability parity with the diffusers `AutoencoderKL` the reference consumes
(`DS_NeRF/guidance/sd_utils.py:85` `self.vae`; encode at `:354,633-641`; decode
at `:418,624-631`). The encoder must be DIFFERENTIABLE: the SDS gradient is
injected at the latents and flows back through `encode` into the rendered image
(`sd_utils.py:427` -> autograd through `_encode_vae_image`).

Architecture (SD-1.x checkpoint-compatible via `weights.py`):
  encoder: conv_in -> [2 resnets + downsample] per channel stage -> mid
           (resnet, single-head attention, resnet) -> GN/silu -> conv_out(2*z)
           -> 1x1 quant_conv; moments split into (mean, logvar).
  decoder: 1x1 post_quant_conv -> conv_in -> mid -> [3 resnets + nearest-2x
           upsample] per stage -> GN/silu -> conv_out(3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from mvip_tpu.guidance.layers import (
    Params,
    attn_init,
    attention,
    conv2d,
    conv_init,
    group_norm,
    norm_init,
    silu,
    upsample_nearest_2x,
)


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215  # diffusers vae.config.scaling_factor

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_channels) - 1)


def tiny_vae_config() -> VAEConfig:
    """Small config for unit tests (runs on CPU in <1s)."""
    return VAEConfig(block_channels=(8, 16), layers_per_block=1, norm_groups=4)


# --- blocks ------------------------------------------------------------------


def _resnet_init(key, c_in: int, c_out: int, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": norm_init(c_in, dtype),
        "conv1": conv_init(k1, 3, 3, c_in, c_out, dtype),
        "norm2": norm_init(c_out, dtype),
        "conv2": conv_init(k2, 3, 3, c_out, c_out, dtype),
    }
    if c_in != c_out:
        p["shortcut"] = conv_init(k3, 1, 1, c_in, c_out, dtype)
    return p


def _resnet(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    h = conv2d(p["conv1"], silu(group_norm(p["norm1"], x, groups, eps=1e-6)))
    h = conv2d(p["conv2"], silu(group_norm(p["norm2"], h, groups, eps=1e-6)))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x)
    return x + h


def _attn_block_init(key, c: int, dtype=jnp.float32) -> Params:
    return {"norm": norm_init(c, dtype), "attn": attn_init(key, c, 1, c, dtype=dtype)}


def _attn_block(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    n, h, w, c = x.shape
    y = group_norm(p["norm"], x, groups, eps=1e-6).reshape(n, h * w, c)
    return x + attention(p["attn"], y, heads=1).reshape(n, h, w, c)


# --- init ---------------------------------------------------------------------


def init_vae(key: jax.Array, cfg: VAEConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    ch = cfg.block_channels
    p: Dict[str, Any] = {}

    # encoder
    enc: Dict[str, Any] = {"conv_in": conv_init(next(keys), 3, 3, cfg.in_channels, ch[0], dtype)}
    blocks = []
    c_prev = ch[0]
    for i, c in enumerate(ch):
        stage = {"resnets": [
            _resnet_init(next(keys), c_prev if j == 0 else c, c, dtype)
            for j in range(cfg.layers_per_block)
        ]}
        if i < len(ch) - 1:
            stage["down"] = conv_init(next(keys), 3, 3, c, c, dtype)
        blocks.append(stage)
        c_prev = c
    enc["down_blocks"] = blocks
    enc["mid"] = {
        "res1": _resnet_init(next(keys), ch[-1], ch[-1], dtype),
        "attn": _attn_block_init(next(keys), ch[-1], dtype),
        "res2": _resnet_init(next(keys), ch[-1], ch[-1], dtype),
    }
    enc["norm_out"] = norm_init(ch[-1], dtype)
    enc["conv_out"] = conv_init(next(keys), 3, 3, ch[-1], 2 * cfg.latent_channels, dtype)
    p["encoder"] = enc
    p["quant_conv"] = conv_init(next(keys), 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels, dtype)

    # decoder
    dec: Dict[str, Any] = {"conv_in": conv_init(next(keys), 3, 3, cfg.latent_channels, ch[-1], dtype)}
    dec["mid"] = {
        "res1": _resnet_init(next(keys), ch[-1], ch[-1], dtype),
        "attn": _attn_block_init(next(keys), ch[-1], dtype),
        "res2": _resnet_init(next(keys), ch[-1], ch[-1], dtype),
    }
    ublocks = []
    c_prev = ch[-1]
    for i, c in enumerate(reversed(ch)):
        stage = {"resnets": [
            _resnet_init(next(keys), c_prev if j == 0 else c, c, dtype)
            for j in range(cfg.layers_per_block + 1)
        ]}
        if i < len(ch) - 1:
            stage["up"] = conv_init(next(keys), 3, 3, c, c, dtype)
        ublocks.append(stage)
        c_prev = c
    dec["up_blocks"] = ublocks
    dec["norm_out"] = norm_init(ch[0], dtype)
    dec["conv_out"] = conv_init(next(keys), 3, 3, ch[0], cfg.out_channels, dtype)
    p["decoder"] = dec
    p["post_quant_conv"] = conv_init(next(keys), 1, 1, cfg.latent_channels, cfg.latent_channels, dtype)
    return p


# --- apply ---------------------------------------------------------------------


def encode_moments(params, cfg: VAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x [N,H,W,3] in [-1,1] -> moments [N,h,w,2*latent] (mean | logvar)."""
    enc = params["encoder"]
    g = cfg.norm_groups
    h = conv2d(enc["conv_in"], x)
    for stage in enc["down_blocks"]:
        for rp in stage["resnets"]:
            h = _resnet(rp, h, g)
        if "down" in stage:
            # asymmetric (0,1,0,1) pad + stride-2 valid conv (SD encoder downsample)
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(stage["down"], h, stride=2, padding="VALID")
    mid = enc["mid"]
    h = _resnet(mid["res1"], h, g)
    h = _attn_block(mid["attn"], h, g)
    h = _resnet(mid["res2"], h, g)
    h = silu(group_norm(enc["norm_out"], h, g, eps=1e-6))
    h = conv2d(enc["conv_out"], h)
    return conv2d(params["quant_conv"], h)


def sample_latents(key, moments: jnp.ndarray) -> jnp.ndarray:
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)


def encode(params, cfg: VAEConfig, x: jnp.ndarray, key=None, sample: bool = True,
           compute_dtype=None):
    """Image -> scaled latents (reference `encode_imgs`, `sd_utils.py:633-641`).

    compute_dtype: run the frozen encoder's convs in this dtype (bf16 on TPU —
    the reference loads the whole SD pipe in fp16, `sd_utils.py:69-74`);
    moments return to f32 before the stochastic sample so the latent noise
    algebra stays full precision. None = params' native dtype (tests/golden
    parity run f32)."""
    if compute_dtype is not None:
        params = jax.tree.map(lambda a: a.astype(compute_dtype), params)
        x = x.astype(compute_dtype)
    moments = encode_moments(params, cfg, x)
    if compute_dtype is not None:
        moments = moments.astype(jnp.float32)
    if sample and key is not None:
        z = sample_latents(key, moments)
    else:
        z = jnp.split(moments, 2, axis=-1)[0]  # mode
    return z * cfg.scaling_factor


def decode(params, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Scaled latents -> image in [-1,1] (reference `decode_latents`, `:624-631`)."""
    z = z / cfg.scaling_factor
    dec = params["decoder"]
    g = cfg.norm_groups
    h = conv2d(dec["conv_in"], conv2d(params["post_quant_conv"], z))
    mid = dec["mid"]
    h = _resnet(mid["res1"], h, g)
    h = _attn_block(mid["attn"], h, g)
    h = _resnet(mid["res2"], h, g)
    for stage in dec["up_blocks"]:
        for rp in stage["resnets"]:
            h = _resnet(rp, h, g)
        if "up" in stage:
            h = conv2d(stage["up"], upsample_nearest_2x(h))
    h = silu(group_norm(dec["norm_out"], h, g, eps=1e-6))
    return conv2d(dec["conv_out"], h)
