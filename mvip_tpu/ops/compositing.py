"""Volume-rendering alpha compositing.

Parity target: `raw2outputs` (`DS_NeRF/run_nerf_helpers.py:350-404`):
  alpha   = 1 - exp(-relu(sigma + noise) * dist * |d|)
  weights = alpha * exclusive_cumprod(1 - alpha + 1e-10)
  rgb_map = sum(w * sigmoid(raw_rgb));  depth = sum(w * z)
  disp    = 1 / max(1e-10, depth / acc);  acc = sum(w)
  white background blend; optional weight-detach (stop_gradient).

TPU-first: a single fused elementwise+scan pipeline; XLA fuses the whole thing into
the tail of the MLP matmul. The exclusive cumprod is expressed in log space-free
`jnp.cumprod` on a shifted axis — identical math to the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CompositeOutputs(NamedTuple):
    rgb: jnp.ndarray      # [..., 3]
    disp: jnp.ndarray     # [...]
    acc: jnp.ndarray      # [...]
    weights: jnp.ndarray  # [..., S]
    depth: jnp.ndarray    # [...]
    alpha: jnp.ndarray    # [..., S]


def render_weights(sigma: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray,
                   noise: Optional[jnp.ndarray] = None,
                   dists: Optional[jnp.ndarray] = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """sigma [..., S], z_vals [..., S], rays_d [..., 3] -> (weights, alpha) [..., S].

    `dists` overrides the consecutive z-differences — occupancy pruning
    (ops/occupancy.py) passes each surviving sample's ORIGINAL stratum width
    so the quadrature is unchanged by compaction (a skipped zero-density
    stratum then contributes exactly nothing, not a stretched neighbor)."""
    if dists is None:
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[..., :1], 1e10)], -1
        )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if noise is not None:
        sigma = sigma + noise
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    # exclusive cumprod of transmittance
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1
    )[..., :-1]
    return alpha * trans, alpha


def alpha_from_weights(weights: jnp.ndarray) -> jnp.ndarray:
    """Recover per-sample alpha from compositing weights [..., S].

    weights_i = alpha_i * T_i with T_i the exclusive transmittance, and
    T_{i+1} = T_i (1 - alpha_i) => T_i = 1 - sum_{j<i} w_j. Used by the eval
    render-tree dump (`DS_NeRF/run.py:1338-1343` saves `extras['alpha']`) for
    the fused Pallas render paths, whose kernels output weights only; exact up
    to the reference's +1e-10 cumprod epsilon."""
    t_excl = 1.0 - jnp.cumsum(weights, -1) + weights
    return weights / jnp.maximum(t_excl, 1e-10)


def composite(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: Optional[jax.Array] = None,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    detach_weights: bool = False,
    noise: Optional[jnp.ndarray] = None,
    dists: Optional[jnp.ndarray] = None,
) -> CompositeOutputs:
    """raw [..., S, 4] (rgb logits + sigma), z_vals [..., S], rays_d [..., 3]."""
    sigma = raw[..., 3]
    if noise is None and raw_noise_std > 0.0:
        noise = jax.random.normal(key, sigma.shape, sigma.dtype) * raw_noise_std
    weights, alpha = render_weights(sigma, z_vals, rays_d, noise, dists)

    rgb = jax.nn.sigmoid(raw[..., :3])
    w_rgb = jax.lax.stop_gradient(weights) if detach_weights else weights
    rgb_map = jnp.sum(w_rgb[..., None] * rgb, -2)

    depth = jnp.sum(weights * z_vals, -1)
    acc = jnp.sum(weights, -1)
    # Reference: disp = 1/max(1e-10, depth/acc) (`run_nerf_helpers.py:387`), which is
    # NaN for empty rays (acc=0 -> 0/0); the reference masks this hazard with
    # raw_noise_std=1. Robust form: empty rays get disparity 0 ("infinitely far"),
    # identical values elsewhere.
    mean_depth = depth / jnp.maximum(acc, 1e-10)
    disp = jnp.where(acc > 1e-8, 1.0 / jnp.maximum(1e-10, mean_depth), 0.0)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return CompositeOutputs(rgb_map, disp, acc, weights, depth, alpha)
