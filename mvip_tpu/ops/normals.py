"""Normal-map extraction from rendered depth.

Parity target: `depth2xyz_torch` + `depth2normal_geo`
(`DS_NeRF/run.py:1909-1940`): back-project depth to camera-space points, then fit a
plane n·p = 1 per pixel over a k×k (default 31×31, zero-padded) neighborhood by
least squares: n = (AᵀA)⁻¹ Aᵀ 1 with A = neighborhood points.

TPU-first: the reference materializes A via `unfold` (a [B, 3·k², H·W] gather — HBM
poison). AᵀA and Aᵀ1 are *box filters* over {x²,xy,xz,y²,yz,z²} and {x,y,z}: we
compute them with two separable 1-D convolutions (O(k) not O(k²) work, conv maps to
MXU) and solve the 3×3 system in closed form. Identical math, including the zero
padding at borders.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def depth_to_points(depth: jnp.ndarray, focal, cx, cy) -> jnp.ndarray:
    """depth [H, W] -> camera-space points [H, W, 3] (pinhole, +z forward).

    Matches `depth2xyz_torch`: x = (col - cx)·z/f, y = (row - cy)·z/f.
    """
    H, W = depth.shape
    row = jnp.arange(H, dtype=depth.dtype)[:, None]
    col = jnp.arange(W, dtype=depth.dtype)[None, :]
    z = depth
    x = (col - cx) * z / focal
    y = (row - cy) * z / focal
    return jnp.stack([x, y, z], -1)


def _box_filter(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """Separable k×k box sum with zero padding. img [H, W, C]."""
    pad = (k - 1) // 2
    kern = jnp.ones((k,), img.dtype)
    # conv along H then W via depthwise 1-D convolutions
    x = jnp.moveaxis(img, -1, 0)[:, None]  # [C, 1, H, W]
    kh = kern.reshape(1, 1, k, 1)
    kw = kern.reshape(1, 1, 1, k)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)])
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)])
    return jnp.moveaxis(x[:, 0], 0, -1)


def points_to_normals(points: jnp.ndarray, k: int = 31) -> jnp.ndarray:
    """points [H, W, 3] -> unnormalized plane-fit normals [H, W, 3].

    Solves (AᵀA) n = Aᵀ1 per pixel, A = zero-padded k×k neighborhood of points.
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    mono = jnp.stack([x, y, z, x * x, x * y, x * z, y * y, y * z, z * z], -1)
    s = _box_filter(mono, k)
    sx, sy, sz, sxx, sxy, sxz, syy, syz, szz = jnp.moveaxis(s, -1, 0)

    ata = jnp.stack(
        [
            jnp.stack([sxx, sxy, sxz], -1),
            jnp.stack([sxy, syy, syz], -1),
            jnp.stack([sxz, syz, szz], -1),
        ],
        -2,
    )  # [H, W, 3, 3]
    atb = jnp.stack([sx, sy, sz], -1)[..., None]  # [H, W, 3, 1]
    normals = jnp.linalg.solve(ata, atb)[..., 0]
    return normals


def depth_to_normal_map(depth: jnp.ndarray, focal, cx, cy, k: int = 31,
                        normalize: bool = False) -> jnp.ndarray:
    """Full pipeline mapped to [0, 1] via (n + 1) / 2 (`run.py:963-965`).

    The reference feeds the *raw* LSQ solution (magnitude = inverse plane offset)
    straight into (n+1)/2 — `normalize=False` reproduces that. `normalize=True`
    L2-normalizes the fitted normal first, which yields a well-scaled normal map.
    """
    pts = depth_to_points(depth, focal, cx, cy)
    n = points_to_normals(pts, k)
    if normalize:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    return (n + 1.0) / 2.0
