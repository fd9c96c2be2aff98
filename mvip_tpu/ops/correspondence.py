"""Cross-view pixel correspondence via depth reprojection.

Capability parity with `DS_NeRF/correspondence_utils.py:4-50`
(`fast_reprojection`, `fast_correspondence` — imported by the reference trainer
but not called in the active loop): project view-i pixels to 3-D with their
depths, reproject into view j, and match against view-j pixels within a depth
tolerance. Vectorized jnp, usable inside jit.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def reproject(
    coords_xy: jnp.ndarray,   # [N, 2] pixel coords in view i
    depth: jnp.ndarray,       # [N] depth along camera z in view i
    c2w_i: jnp.ndarray,       # [3, 4]
    c2w_j: jnp.ndarray,       # [3, 4]
    H: int,
    W: int,
    focal: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ([N, 2] pixel coords in view j, [N] depths in view j's frame)."""
    from mvip_tpu.ops.rays import ray_directions

    rd = ray_directions(coords_xy, focal, H, W, c2w_i)
    pts_w = c2w_i[:3, 3] + rd * depth[..., None]

    rel = pts_w - c2w_j[:3, 3]
    cam = rel @ c2w_j[:3, :3]              # world -> camera (R is orthonormal)
    z = -cam[..., 2]
    u = cam[..., 0] / jnp.maximum(z, 1e-8) * focal + W * 0.5
    v = -cam[..., 1] / jnp.maximum(z, 1e-8) * focal + H * 0.5
    return jnp.stack([u, v], -1), z


def correspondence(
    coords_i: jnp.ndarray,
    depth_i: jnp.ndarray,
    depth_map_j: jnp.ndarray,   # [H, W] rendered depth of view j
    c2w_i: jnp.ndarray,
    c2w_j: jnp.ndarray,
    H: int,
    W: int,
    focal: float,
    tol: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match view-i pixels to view-j pixels: reproject, then keep matches whose
    reprojected depth agrees with view j's depth map within `tol` (relative).

    Returns ([N, 2] view-j coords, [N] bool validity)."""
    uv, z = reproject(coords_i, depth_i, c2w_i, c2w_j, H, W, focal)
    u = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, H - 1)
    inside = (
        (uv[..., 0] >= 0) & (uv[..., 0] <= W - 1)
        & (uv[..., 1] >= 0) & (uv[..., 1] <= H - 1)
        & (z > 0)
    )
    dj = depth_map_j[v, u]
    ok = inside & (jnp.abs(dj - z) <= tol * jnp.maximum(z, 1e-8))
    return jnp.stack([u, v], -1), ok
