"""Pallas TPU kernel: fused hierarchical (inverse-CDF) importance sampler.

The TPU-native replacement for the reference's native searchsorted path
(`DS_NeRF/torchsearchsorted/src/cuda/searchsorted_cuda_kernel.cu:1-143`, used
by `sample_pdf`, `DS_NeRF/run_nerf_helpers.py:304-347`): one kernel fuses the
whole resampling step — PDF normalization, CDF cumsum, the sorted-search, and
the linear interpolation — entirely in VMEM, so no [R, B]-sized intermediates
ever round-trip through HBM.

Search strategy: on TPU a per-element binary search is a serial gather chain
(VPU-hostile). With B ~ 64 bins a *comparison-count* is far faster: the VPU
evaluates all R×S×B comparisons in a handful of vector ops
(inds = sum_j [cdf_j <= u]), and the below/above CDF/bin values come from
masked reductions instead of gathers. Identical results to
`jnp.searchsorted(side='right')`, verified against the numpy and C++ oracles.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _sample_pdf_kernel(bins_ref, weights_ref, u_ref, out_ref, *, eps: float):
    bins = bins_ref[:]        # [R, B]   (bin edges; B = n_bins)
    w = weights_ref[:]        # [R, B-1] (bin masses)
    u = u_ref[:]              # [R, S]
    R, B = bins.shape
    S = u.shape[-1]

    w = w + eps
    pdf = w / jnp.sum(w, -1, keepdims=True)
    # cumsum lowers poorly in Mosaic; an upper-triangular ones matmul puts the
    # prefix sum on the MXU instead: cdf_j = sum_{k<=j} pdf_k
    nb = B - 1
    ki = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    tri = (ki <= ji).astype(pdf.dtype)
    # HIGHEST precision: the default MXU bf16-pass matmul loses ~1e-3 on the
    # CDF, which flips searchsorted bins near boundaries
    cdf = jax.lax.dot_general(
        pdf, tri, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).astype(pdf.dtype)
    cdf = jnp.concatenate([jnp.zeros((R, 1), cdf.dtype), cdf], -1)  # [R, B]

    # inds = #(cdf <= u) per query — searchsorted(side='right')
    cmp = (cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32)  # [R, S, B]
    inds = jnp.sum(cmp, -1)                                     # [R, S]
    below = jnp.clip(inds - 1, 0, B - 1)
    above = jnp.clip(inds, 0, B - 1)

    j = jax.lax.broadcasted_iota(jnp.int32, (R, S, B), 2)
    oh_b = (j == below[:, :, None]).astype(cdf.dtype)
    oh_a = (j == above[:, :, None]).astype(cdf.dtype)
    cdf_b = jnp.sum(cdf[:, None, :] * oh_b, -1)
    cdf_a = jnp.sum(cdf[:, None, :] * oh_a, -1)
    bins_b = jnp.sum(bins[:, None, :] * oh_b, -1)
    bins_a = jnp.sum(bins[:, None, :] * oh_a, -1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    out_ref[:] = bins_b + t * (bins_a - bins_b)


@partial(jax.jit, static_argnames=("n_samples", "det", "block_rays", "interpret"))
def sample_pdf_pallas(
    bins: jnp.ndarray,      # [R, B] bin edges (z midpoints)
    weights: jnp.ndarray,   # [R, B-1] bin masses
    n_samples: int,
    key: Optional[jax.Array] = None,
    det: bool = False,
    u: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    block_rays: int = 64,   # [blk, S, B] VMEM intermediates: keep under ~8MB
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused equivalent of `mvip_tpu.ops.sampling.sample_pdf`."""
    R, B = bins.shape
    dtype = bins.dtype
    if u is None:
        if det:
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, n_samples, dtype=dtype), (R, n_samples)
            )
        else:
            u = jax.random.uniform(key, (R, n_samples), dtype=dtype)
    else:
        u = jnp.broadcast_to(jnp.asarray(u, dtype), (R, n_samples))

    blk = min(block_rays, R)
    n_blocks = _cdiv(R, blk)
    pad = n_blocks * blk - R
    if pad:
        bins = jnp.concatenate([bins, jnp.broadcast_to(bins[-1:], (pad, B))])
        weights = jnp.concatenate(
            [weights, jnp.broadcast_to(weights[-1:], (pad, B - 1))]
        )
        u = jnp.concatenate([u, jnp.broadcast_to(u[-1:], (pad, n_samples))])

    out = pl.pallas_call(
        partial(_sample_pdf_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n_blocks * blk, n_samples), dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((blk, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, B - 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n_samples), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (blk, n_samples), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(bins, weights, u)
    return out[:R]
