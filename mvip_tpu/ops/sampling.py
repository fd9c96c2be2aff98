"""Ray-marching sample placement: stratified coarse samples + inverse-CDF importance
resampling.

Parity targets:
  * stratified/lindisp z placement — `DS_NeRF/run.py:1759-1781`
  * `sample_pdf` inverse-CDF hierarchical sampler — `DS_NeRF/run_nerf_helpers.py:304-347`
    (the capability the vendored `torchsearchsorted` CUDA kernel served).

TPU-first: fully batched `jnp` formulation with static shapes; `jnp.searchsorted` is the
oracle implementation, and `mvip_tpu.ops.pallas.sample_pdf_pallas` provides the fused
TPU kernel for the hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_z_vals(
    key: Optional[jax.Array],
    n_rays: int,
    n_samples: int,
    near: jnp.ndarray,
    far: jnp.ndarray,
    lindisp: bool = False,
    perturb: float = 0.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Place `n_samples` depths per ray in [near, far].

    near/far: broadcastable to [n_rays, 1]. With `perturb > 0`, jitter each sample
    uniformly within its stratum (requires `key`).
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    near = jnp.broadcast_to(jnp.asarray(near, dtype), (n_rays, 1))
    far = jnp.broadcast_to(jnp.asarray(far, dtype), (n_rays, 1))
    if lindisp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    z = jnp.broadcast_to(z, (n_rays, n_samples))
    if perturb > 0.0:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], -1)
        lower = jnp.concatenate([z[..., :1], mids], -1)
        u = jax.random.uniform(key, z.shape, dtype=dtype)
        z = lower + (upper - lower) * u
    return z


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    key: Optional[jax.Array] = None,
    det: bool = False,
    u: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Inverse-CDF sample `n_samples` new depths from a piecewise-constant PDF.

    bins:    [..., B+1-1] bin edges (reference passes z-midpoints, B-1 of them)
    weights: [..., B] unnormalized bin masses (reference passes weights[1:-1])
    u:       optional explicit uniforms (the `pytest=` determinism seam of
             `run_nerf_helpers.py:319-327`); overrides key/det.
    """
    dtype = bins.dtype
    weights = weights + eps
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [..., B+1]

    ushape = cdf.shape[:-1] + (n_samples,)
    if u is None:
        if det:
            u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples, dtype=dtype), ushape)
        else:
            u = jax.random.uniform(key, ushape, dtype=dtype)
    else:
        u = jnp.broadcast_to(jnp.asarray(u, dtype), ushape)

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(
        cdf.reshape(-1, cdf.shape[-1]), u.reshape(-1, n_samples)
    ).reshape(ushape)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def merge_z_vals(z_coarse: jnp.ndarray, z_fine: jnp.ndarray) -> jnp.ndarray:
    """Sorted union of coarse and importance depths (`run.py:1814`)."""
    return jnp.sort(jnp.concatenate([z_coarse, z_fine], -1), -1)
