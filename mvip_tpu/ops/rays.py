"""Pinhole ray generation (device-side, jnp).

Parity target: `get_rays` / `get_rays_np` / `get_rays_by_coord_np`
(`DS_NeRF/run_nerf_helpers.py:249-281`): OpenGL-style camera with x right, y up,
z backward — dirs = [(i - W/2)/f, -(j - H/2)/f, -1] rotated by c2w[:3,:3].

TPU-first: these run inside jit (full-image renders, per-view masked-pixel gathers),
so they are jnp, static-shaped, and batched over arbitrary coordinate sets.
"""

from __future__ import annotations

import jax.numpy as jnp


def ray_directions(coords_xy: jnp.ndarray, focal, H: int, W: int,
                   c2w: jnp.ndarray) -> jnp.ndarray:
    """coords_xy [..., 2] pixel coordinates (x=col, y=row) -> world dirs [..., 3]."""
    x, y = coords_xy[..., 0], coords_xy[..., 1]
    dirs = jnp.stack(
        [(x - W * 0.5) / focal, -(y - H * 0.5) / focal, -jnp.ones_like(x)], -1
    )
    return jnp.sum(dirs[..., None, :] * c2w[:3, :3], -1)


def rays_for_pose(H: int, W: int, focal, c2w: jnp.ndarray):
    """Full-image ray grid: returns (rays_o, rays_d), each [H, W, 3]."""
    x, y = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32), indexing="xy"
    )
    rays_d = ray_directions(jnp.stack([x, y], -1), focal, H, W, c2w)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def rays_at_coords(H: int, W: int, focal, c2w: jnp.ndarray, coords_xy: jnp.ndarray):
    """Rays through specific pixels; coords_xy [N, 2] as (x=col, y=row)."""
    rays_d = ray_directions(coords_xy, focal, H, W, c2w)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def rays_at_view_coords(
    poses: jnp.ndarray,
    view_idx: jnp.ndarray,
    coords_xy: jnp.ndarray,
    H: int,
    W: int,
    focal,
):
    """Batched rays across views: poses [V, 3, 4], view_idx [N], coords_xy [N, 2].

    The device-side core of the implicit ray pool (`mvip_tpu.data.rays`): rays are
    regenerated from (view, pixel) indices inside the jitted train step instead of
    being materialized in HBM.
    """
    c2w = poses[view_idx]                                 # [N, 3, 4]
    x, y = coords_xy[..., 0], coords_xy[..., 1]
    dirs = jnp.stack(
        [(x - W * 0.5) / focal, -(y - H * 0.5) / focal, -jnp.ones_like(x)], -1
    )
    rays_d = jnp.einsum("nj,nij->ni", dirs, c2w[:, :3, :3])
    return c2w[:, :3, 3], rays_d
