"""NN building blocks for the guidance nets (VAE / UNet / CLIP) — pure JAX, NHWC.

TPU-first layout decisions:
- NHWC activations: channels ride the 128-lane axis, convs lower to MXU matmuls.
- All matmuls/convs take `preferred_element_type=float32` so bf16 params still
  accumulate in fp32 on the MXU.
- Attention is `einsum`-based (batched MXU matmuls), no flash tricks needed at
  SD sizes (64x64 latents -> 4096 tokens max).

Parity notes: the math of each block matches the corresponding Stable Diffusion
component consumed by the reference through diffusers
(`DS_NeRF/guidance/sd_utils.py:69-88`); layout (NHWC, [in,out] weight matrices)
and implementation are TPU-native, not a port.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers


def linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), dtype, -bound, bound),
    }


def conv_init(key, kh: int, kw: int, c_in: int, c_out: int, dtype=jnp.float32) -> Params:
    """Weights stored HWIO (NHWC-native conv layout)."""
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * c_in
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(k1, (kh, kw, c_in, c_out), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (c_out,), dtype, -bound, bound),
    }


def norm_init(channels: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)}


# ---------------------------------------------------------------------------
# primitives


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """MXU matmul with fp32 accumulation; output stays in the activation dtype."""
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(x.dtype)


def conv2d(p: Params, x: jnp.ndarray, stride: int = 1, padding=None) -> jnp.ndarray:
    """x [N,H,W,C]; weights HWIO; fp32 accumulation, activation-dtype output.

    Default padding is torch-style k//2 per side (what SD checkpoints assume).
    NOTE XLA's "SAME" pads (0,1) for stride-2 3x3 where torch pads (1,1) —
    using SAME here would silently misalign ported SD weights (caught by
    tests/test_torch_parity.py)."""
    if padding is None:
        kh, kw = p["w"].shape[:2]
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    # f32 activations keep the explicit f32 accumulate (bit-identical to the
    # golden-tested path). bf16 activations emit bf16: conv_general_dilated's
    # TRANSPOSE rejects mixed f32-cotangent/bf16-operand pairs, so an
    # upcasting conv is not differentiable — and the MXU accumulates bf16
    # operands in f32 internally regardless, so only the inter-pass partial
    # rounding changes (frozen-guidance-net noise floor; the reference's fp16
    # torch pipe rounds identically).
    pet = jnp.float32 if x.dtype == jnp.dtype(jnp.float32) else x.dtype
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
    )
    return (y + p["b"]).astype(x.dtype)


def group_norm(p: Params, x: jnp.ndarray, groups: int = 32, eps: float = 1e-5):
    """x [..., C]; normalizes over spatial dims + channels-within-group."""
    c = x.shape[-1]
    g = min(groups, c)
    while c % g:
        g -= 1
    shape, dtype = x.shape, x.dtype
    xg = x.astype(jnp.float32).reshape(shape[0], -1, g, c // g)  # [N, HW, G, C/G]
    mean = xg.mean((1, 3), keepdims=True)
    var = xg.var((1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(shape) * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32) \
        + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


# ---------------------------------------------------------------------------
# attention


def attn_init(key, query_dim: int, heads: int, dim_head: int,
              context_dim: Optional[int] = None, dtype=jnp.float32) -> Params:
    context_dim = context_dim or query_dim
    inner = heads * dim_head
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q": linear_init(k1, query_dim, inner, dtype),
        "k": linear_init(k2, context_dim, inner, dtype),
        "v": linear_init(k3, context_dim, inner, dtype),
        "o": linear_init(k4, inner, query_dim, dtype),
    }


def _use_flash_attention(is_self: bool, mask, Tq: int, Tk: int, dh: int) -> bool:
    """Opt-in (MVIP_FLASH_ATTN=1) Pallas TPU flash-attention path for long
    self-attention — measured at SD-1.5 scale and REFUTED as a default:

    Standalone jits (one v5e, bf16, tunnel-inflated but like-for-like) showed
    a win at S=1024 dh=80 (flash 3.9 ms vs XLA 8.5) and a loss at S=4096
    dh=40 (11.1 vs 5.7 — padding dh to the 128-lane MXU tile triples the
    QK^T FLOPs). But inside the FULL 860M-param inpaint UNet the selective
    gate is a net loss anyway (tools/bench_guidance.py, CFG pair bf16:
    43.1 ms flash vs 37.9 XLA; colla batch-10: 175.7 vs 166.7): XLA fuses
    the materialized-logits softmax chain with its neighbors better than the
    kernel boundary allows, and the [B,T,H,D]->[B,H,T,D] transposes around
    the kernel are pure overhead. Kept as a knob for future shapes (e.g.
    1024px latents, S=16k, where logits no longer fit HBM comfortably).
    Cross-attention (Tk=77) always stays XLA: kv fits one tile."""
    if os.environ.get("MVIP_FLASH_ATTN", "").lower() in ("", "0", "false", "no"):
        return False
    return (
        is_self and mask is None and Tq == Tk
        # the kernel's default BlockSizes are 128 (raises on indivisible
        # seqs); 64 <= dh <= 128 is the measured-win range — dh=512 (the
        # VAE mid-block) and dh=40 are unmeasured/refuted shapes
        and Tq >= 512 and Tq % 128 == 0 and 64 <= dh <= 128
        and jax.default_backend() == "tpu"
    )


# Materialized-logits budget above which `attention` auto-chunks its query
# axis (see the comment at the chunking site). Override: MVIP_ATTN_LOGITS_BYTES.
# 512 MB (not 1 GB): at 1 GB the config-5 real-scale step still missed v5e
# HBM by 31 MB (15.78/15.75 measured r4) — the 768-row chunk's f32
# [10,8,768,4096] buffer was 960 MB; 384-row chunks leave ~450 MB margin.
_ATTN_LOGITS_BUDGET = int(os.environ.get("MVIP_ATTN_LOGITS_BYTES", 1 << 29))


def attention(
    p: Params,
    x: jnp.ndarray,                       # [B, Tq, C]
    context: Optional[jnp.ndarray] = None,  # [B, Tk, Cc]
    heads: int = 8,
    mask: Optional[jnp.ndarray] = None,   # [Tq, Tk] additive
    q_chunk: Optional[int] = None,        # tests/debug: force a chunk size
) -> jnp.ndarray:
    is_self = context is None
    context = x if context is None else context
    q, k, v = linear(p["q"], x), linear(p["k"], context), linear(p["v"], context)
    B, Tq, inner = q.shape
    Tk = k.shape[1]
    dh = inner // heads
    q = q.reshape(B, Tq, heads, dh)
    k = k.reshape(B, Tk, heads, dh)
    v = v.reshape(B, Tk, heads, dh)
    if _use_flash_attention(is_self, mask, Tq, Tk, dh):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention,
        )

        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=1.0 / math.sqrt(dh),
        ).transpose(0, 2, 1, 3)
        return linear(p["o"], out.reshape(B, Tq, inner).astype(x.dtype))
    if q_chunk is None and B * heads * Tq * Tk * 4 > _ATTN_LOGITS_BUDGET:
        # Auto-engage query chunking when the materialized f32 logits would
        # exceed the budget (default 512 MB — see _ATTN_LOGITS_BUDGET; env
        # MVIP_ATTN_LOGITS_BYTES overrides). The
        # batch-10 colla CFG UNet at real SD scale hits f32[10,8,4096,4096]
        # = 5 GB on its 64x64 self-attention — the single allocation that
        # OOMs a 16 GB v5e (measured r4, BASELINE.md). torch never
        # materializes this either (diffusers sliced attention / sdpa);
        # this is the XLA analog: softmax is independent per query row, so
        # chunk the queries and remat each chunk. dh=40 makes the Pallas
        # flash kernel a refuted shape here (_use_flash_attention).
        # Floor of 128 query rows: with Tq <= 128 the guard never engages,
        # and a B*heads*Tk so large that even a 128-row chunk exceeds the
        # budget still goes through at 128 rows. Both are out of range for
        # SD shapes (self-attn Tq=Tk>=1024, cross-attn Tk=77) — the floor
        # keeps the chunk MXU-friendly rather than guaranteeing the budget.
        q_chunk = max(
            128,
            _ATTN_LOGITS_BUDGET // max(B * heads * Tk * 4, 1) // 128 * 128,
        )
    if q_chunk is not None and q_chunk < Tq:
        nc = -(-Tq // q_chunk)
        qp = (jnp.concatenate(
            [q, jnp.zeros((B, nc * q_chunk - Tq, heads, dh), q.dtype)], 1)
            if nc * q_chunk > Tq else q)
        qs = jnp.moveaxis(
            qp.reshape(B, nc, q_chunk, heads, dh), 1, 0)  # [nc, B, CH, H, D]
        ms = (None if mask is None else jnp.concatenate(
            [mask, jnp.zeros((nc * q_chunk - mask.shape[0], Tk), mask.dtype)]
        ).reshape(nc, q_chunk, Tk))

        @jax.checkpoint
        def _chunk(args):
            qc, mc = args
            lg = jnp.einsum("bqhd,bkhd->bhqk", qc, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dh)
            if mc is not None:
                lg = lg + mc
            wc = jax.nn.softmax(lg.astype(jnp.float32), -1).astype(v.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", wc, v,
                              preferred_element_type=jnp.float32)

        out = jax.lax.map(_chunk, (qs, ms))          # [nc, B, CH, H, D]
        out = jnp.moveaxis(out, 0, 1).reshape(B, nc * q_chunk, heads, dh)
        out = out[:, :Tq]
        return linear(p["o"], out.reshape(B, Tq, inner).astype(x.dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(dh)
    if mask is not None:
        logits = logits + mask
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32)
    return linear(p["o"], out.reshape(B, Tq, inner).astype(x.dtype))


# ---------------------------------------------------------------------------
# timestep embedding


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True) -> jnp.ndarray:
    """Sinusoidal embedding, SD convention (freq_shift=0, [cos|sin] order)."""
    t = jnp.atleast_1d(t).astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t[:, None] * freqs[None, :]
    sin, cos = jnp.sin(ang), jnp.cos(ang)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], -1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# ---------------------------------------------------------------------------
# resizing (torch.nn.functional.interpolate equivalents)


def resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """align_corners=False bilinear (half-pixel centers — jax.image default).

    Matches `F.interpolate(..., mode='bilinear', align_corners=False)` at the
    reference's guidance entry (`sd_utils.py:282-284`).
    """
    return jax.image.resize(x, (*x.shape[:-3], h, w, x.shape[-1]), method="bilinear")


def resize_nearest(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Mask downsample to latent resolution (diffusers prepare_mask_latents)."""
    return jax.image.resize(x, (*x.shape[:-3], h, w, x.shape[-1]), method="nearest")


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c)).reshape(
        n, 2 * h, 2 * w, c
    )
