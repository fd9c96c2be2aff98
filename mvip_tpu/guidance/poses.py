"""Orbit-camera pose sampling + view-direction bucketing for guidance.

Capability parity with `DS_NeRF/nerf/utils.py:80-171` (`rand_poses`,
`get_view_direction`, `safe_normalize`) — pure JAX with explicit PRNG keys
instead of global torch/python RNG state.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), eps))


def get_view_direction(thetas: jnp.ndarray, phis: jnp.ndarray,
                       overhead: float, front: float) -> jnp.ndarray:
    """Bucket (polar, azimuth) into {front=0, side-left=1, back=2, side-right=3,
    top=4, bottom=5} (`nerf/utils.py:80-98`)."""
    two_pi = 2.0 * math.pi
    phis = jnp.mod(phis, two_pi)
    res = jnp.ones_like(phis, dtype=jnp.int32)  # default: side (cam left)
    res = jnp.where((phis < front / 2) | (phis >= two_pi - front / 2), 0, res)
    res = jnp.where((phis >= math.pi - front / 2) & (phis < math.pi + front / 2), 2, res)
    res = jnp.where((phis >= math.pi + front / 2) & (phis < two_pi - front / 2), 3, res)
    res = jnp.where(thetas <= overhead, 4, res)
    res = jnp.where(thetas >= math.pi - overhead, 5, res)
    return res


def rand_poses(
    key: jax.Array,
    size: int,
    radius_range: Tuple[float, float] = (1.0, 1.5),
    theta_range: Tuple[float, float] = (0.0, 120.0),
    phi_range: Tuple[float, float] = (0.0, 360.0),
    return_dirs: bool = False,
    angle_overhead: float = 30.0,
    angle_front: float = 60.0,
    uniform_sphere_rate: float = 0.5,
):
    """Random orbit-camera c2w poses (`nerf/utils.py:102-168`).

    Returns (poses [size,4,4], dirs or None, thetas_deg, phis_deg, radius)."""
    k_mode, k_r, k_t, k_p, k_s = jax.random.split(key, 5)
    d2r = math.pi / 180.0
    th_lo, th_hi = theta_range[0] * d2r, theta_range[1] * d2r
    ph_lo, ph_hi = phi_range[0] * d2r, phi_range[1] * d2r

    radius = jax.random.uniform(k_r, (size,), minval=radius_range[0],
                                maxval=radius_range[1])

    # uniform-on-upper-sphere branch
    g = jax.random.normal(k_s, (size, 3))
    unit = safe_normalize(jnp.stack([g[:, 0], jnp.abs(g[:, 1]), g[:, 2]], -1))
    thetas_u = jnp.arccos(jnp.clip(unit[:, 1], -1.0, 1.0))
    phis_u = jnp.mod(jnp.arctan2(unit[:, 0], unit[:, 2]), 2 * math.pi)
    centers_u = unit * radius[:, None]

    # range-restricted branch
    thetas_r = jax.random.uniform(k_t, (size,), minval=th_lo, maxval=th_hi)
    phis_r = jnp.mod(jax.random.uniform(k_p, (size,), minval=ph_lo, maxval=ph_hi),
                     2 * math.pi)
    centers_r = jnp.stack([
        radius * jnp.sin(thetas_r) * jnp.sin(phis_r),
        radius * jnp.cos(thetas_r),
        radius * jnp.sin(thetas_r) * jnp.cos(phis_r),
    ], -1)

    use_uniform = jax.random.uniform(k_mode, ()) < uniform_sphere_rate
    thetas = jnp.where(use_uniform, thetas_u, thetas_r)
    phis = jnp.where(use_uniform, phis_u, phis_r)
    centers = jnp.where(use_uniform, centers_u, centers_r)

    forward = safe_normalize(centers)  # lookat origin
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (size, 3))
    right = safe_normalize(jnp.cross(forward, up))
    up = safe_normalize(jnp.cross(right, forward))

    poses = jnp.tile(jnp.eye(4), (size, 1, 1))
    rot = jnp.stack([right, up, forward], -1)
    poses = poses.at[:, :3, :3].set(rot)
    poses = poses.at[:, :3, 3].set(centers)

    dirs = None
    if return_dirs:
        dirs = get_view_direction(thetas, phis, angle_overhead * d2r, angle_front * d2r)
    return poses, dirs, thetas / d2r, phis / d2r, radius
