"""End-to-end MVIP (guidance-on) train step on tiny models.

Exercises the full second-stage algorithm in one jitted program: masked-view
render -> composite -> RGB SDS, downsampled depth -> normal SDS, neighbor-view
renders -> collaborative SDS, plus base MSE/depth losses and the Adam update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.data.rays import build_ray_streams
from mvip_tpu.guidance.sds import SDSConfig, make_guidance_models
from mvip_tpu.guidance.unet import init_unet, tiny_unet_config
from mvip_tpu.guidance.vae import init_vae, tiny_vae_config
from mvip_tpu.models.nerf_mlp import NeRFMLPConfig, apply_nerf_mlp, init_nerf_mlp
from mvip_tpu.render.renderer import RenderOptions
from mvip_tpu.train.mvip_step import MVIPConfig, make_mvip_train_step
from mvip_tpu.train.state import create_train_state, make_optimizer
from mvip_tpu.train.step import DeviceStreams, StepConfig


def _tiny_scene(n_views=4, H=16, W=20, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 1, (n_views, H, W, 3)).astype(np.float32)
    masks = np.zeros((n_views, H, W), np.float32)
    masks[:, 5:11, 6:14] = 1.0
    depths = rng.uniform(0.2, 0.8, (n_views, H, W)).astype(np.float32)
    poses = np.zeros((n_views, 3, 4), np.float32)
    for v in range(n_views):
        th = v * 0.4
        c, s = np.cos(th), np.sin(th)
        poses[v, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        poses[v, :3, 3] = [s * 4, 0, c * 4]
    return images, masks, depths, poses, 18.0


def test_mvip_step_all_guidance(key):
    images, masks, depths, poses, focal = _tiny_scene()
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    H, W = images.shape[1:3]

    mcfg_model = NeRFMLPConfig(depth=2, width=32, multires=4, multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(1), mcfg_model),
        "fine": init_nerf_mlp(jax.random.PRNGKey(2), mcfg_model),
    }
    apply_fn = lambda p, pts, vd: apply_nerf_mlp(p, mcfg_model, pts, vd)

    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))

    ropts = RenderOptions(n_samples=8, n_importance=8, perturb=1.0, raw_noise_std=1.0)
    scfg = StepConfig(n_rand=32, depth_loss=True, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    mcfg = MVIPConfig(
        sds_loss_weight=1e-4,
        is_rgb_guidance=True,
        is_normal_guidance=True, normal_start=0, normalmap_render_factor=2,
        normal_k=5,
        is_colla_guidance=True, colla_n_views=3, colla_render_factor=2,
        render_chunk=64,
    )
    optimizer = make_optimizer(5e-3, 250)
    state = create_train_state(params, optimizer)
    step = make_mvip_train_step(
        scfg, ropts, apply_fn, apply_fn, optimizer, mcfg, gm,
        scfg_sds, scfg_sds, scfg_sds, te, te,
    )

    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), state.params)
    for i in range(3):
        state, metrics = step(state, streams, jax.random.fold_in(key, i),
                              jnp.asarray(i + 1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["sds_rgb"]))
    assert np.isfinite(float(metrics["sds_normal"]))
    assert np.isfinite(float(metrics["sds_colla"]))
    # params must have moved
    moved = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()) > 0,
                     state.params, p0)
    )
    assert any(moved)


def test_mvip_megastep_matches_stride1(key):
    """The guidance megastep (n_inner > 1) must produce the SAME params as
    n_inner sequential stride-1 dispatches when fed the matching keys/indices
    (scan body folds key by inner index; loop folds base key by dispatch i)."""
    images, masks, depths, poses, focal = _tiny_scene()
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    H, W = images.shape[1:3]
    mcfg_model = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(1), mcfg_model),
        "fine": None,
    }
    apply_fn = lambda p, pts, vd: apply_nerf_mlp(p, mcfg_model, pts, vd)
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))
    ropts = RenderOptions(n_samples=6, n_importance=0, perturb=0.0,
                          raw_noise_std=0.0)
    scfg = StepConfig(n_rand=16, depth_loss=False, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    mcfg = MVIPConfig(sds_loss_weight=1e-4, is_rgb_guidance=True,
                      render_chunk=64)
    optimizer = make_optimizer(5e-3, 250)
    args = (scfg, ropts, apply_fn, None, optimizer, mcfg, gm,
            scfg_sds, scfg_sds, scfg_sds, te, te)

    step1 = make_mvip_train_step(*args)
    scan2 = make_mvip_train_step(*args, n_inner=2)

    # the step donates its input state; give each run its own fresh buffers
    p_host = jax.tree.map(lambda a: np.asarray(a).copy(), params)
    fresh = lambda: jax.tree.map(jnp.asarray, p_host)

    s_a = create_train_state(fresh(), optimizer)
    base = jax.random.fold_in(key, 9)
    for j in range(2):
        s_a, m_a = step1(s_a, streams, jax.random.fold_in(base, j),
                         jnp.asarray(4 + j, jnp.int32))

    s_b = create_train_state(fresh(), optimizer)
    s_b, m_b = scan2(s_b, streams, base, jnp.asarray(4, jnp.int32))

    assert int(s_b.step) == int(s_a.step) == 2
    for la, lb in zip(jax.tree_util.tree_leaves(s_a.params),
                      jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=2e-5, atol=2e-6)


def test_composite_skips_padded_coords(key):
    """Padded coord slots (>= masked_counts) must not scatter. Regression: a
    view with ZERO masked pixels kept the all-zeros pad, which scattered a
    garbage render into pixel (0,0) of the composite."""
    from mvip_tpu.train.mvip_step import composite_masked_render

    H, W, P = 8, 10, 6
    gt = jax.random.uniform(key, (H, W, 3))
    rgb = jnp.full((P, 3), 9.0)  # sentinel render values

    # zero masked pixels: composite must equal GT exactly (incl. pixel (0,0))
    coords = jnp.zeros((P, 2), jnp.int32)
    out = composite_masked_render(gt, coords, jnp.asarray(0), rgb)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(gt))

    # partial mask: first k scatter, pad slots (duplicating coord k-1) do not
    k = 3
    coords = coords.at[:k, 0].set(jnp.arange(1, k + 1))  # x = 1,2,3 ; y = 0
    coords = coords.at[k:].set(coords[k - 1])
    out = np.array(composite_masked_render(gt, coords, jnp.asarray(k), rgb))
    assert (out[0, 1:4] == 9.0).all()
    out[0, 1:4] = np.asarray(gt)[0, 1:4]
    np.testing.assert_array_equal(out, np.asarray(gt))

    # gradient flows through valid slots only
    def f(r):
        return composite_masked_render(gt, coords, jnp.asarray(k), r).sum()

    g = np.asarray(jax.grad(f)(rgb))
    assert (g[:k].sum(-1) > 0).any() and (g[k:] == 0).all()


def test_mvip_step_maskfree_view(key):
    """End-to-end: a dataset where one view has no masked pixels trains fine."""
    images, masks, depths, poses, focal = _tiny_scene(n_views=2, H=12, W=14)
    masks[1] = 0.0  # view 1 is mask-free
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    assert int(streams.masked_counts[1]) == 0
    H, W = images.shape[1:3]
    mc = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
    apply_fn = lambda p, pts, vd: apply_nerf_mlp(p, mc, pts, vd)
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))
    ropts = RenderOptions(n_samples=8, n_importance=0, perturb=1.0)
    scfg = StepConfig(n_rand=16, depth_loss=False, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    mcfg = MVIPConfig(is_rgb_guidance=True, is_normal_guidance=False,
                      is_colla_guidance=False, render_chunk=64)
    optimizer = make_optimizer(5e-3, 250)
    step = make_mvip_train_step(
        scfg, ropts, apply_fn, None, optimizer, mcfg, gm,
        scfg_sds, scfg_sds, scfg_sds, te, te,
    )
    # run enough steps that the random view lands on the mask-free one
    state = create_train_state({"coarse": init_nerf_mlp(key, mc), "fine": None},
                               optimizer)
    for i in range(4):
        state, metrics = step(state, streams, jax.random.fold_in(key, i),
                              jnp.asarray(i + 1))
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow  # ~6 min: two full interpret-mode fused guidance steps x2
def test_mvip_step_fused_guidance_multichip(key):
    """shard_map'd fused guidance renders (ROADMAP r2 #5): on the 8-device
    CPU mesh, the sharded-ray-axis fused path must reproduce the
    single-device fused path — same loss, same updated params — under
    deterministic rendering (perturb=0, no sigma noise), where the
    per-device key fold-in cannot change any drawn value. Replaces the
    reference's `nn.DataParallel` scatter (`DS_NeRF/run.py:43-46`) for the
    guidance-on hot loop."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        import pytest as _pytest

        _pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(devs[:8]), ("data",))

    images, masks, depths, poses, focal = _tiny_scene()
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    H, W = images.shape[1:3]

    mc = NeRFMLPConfig(depth=2, width=32, multires=4, multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(1), mc),
        "fine": init_nerf_mlp(jax.random.PRNGKey(2), mc),
    }
    apply_fn = lambda p, pts, vd: apply_nerf_mlp(p, mc, pts, vd)

    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))

    # deterministic rendering: per-device key fold-in is a no-op
    ropts = RenderOptions(n_samples=8, n_importance=8, perturb=0.0,
                          raw_noise_std=0.0)
    scfg = StepConfig(n_rand=32, depth_loss=True, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    mcfg = MVIPConfig(
        sds_loss_weight=1e-4,
        is_rgb_guidance=True,
        is_normal_guidance=True, normal_start=0, normalmap_render_factor=2,
        normal_k=5,
        is_colla_guidance=True, colla_n_views=3, colla_render_factor=2,
        render_chunk=64,
    )
    optimizer = make_optimizer(5e-3, 250)

    def run(use_mesh):
        step = make_mvip_train_step(
            scfg, ropts, apply_fn, apply_fn, optimizer, mcfg, gm,
            scfg_sds, scfg_sds, scfg_sds, te, te,
            fused_mlp_cfg=mc, mesh=mesh if use_mesh else None,
            interpret=True,
        )
        state = create_train_state(jax.tree.map(jnp.copy, params), optimizer)
        with mesh:
            for i in range(2):
                state, metrics = step(
                    state, streams, jax.random.fold_in(key, i),
                    jnp.asarray(i + 1),
                )
        return state, metrics

    s1, m1 = run(False)
    s8, m8 = run(True)
    assert np.isfinite(float(m8["loss"]))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m8["sds_rgb"]), float(m1["sds_rgb"]),
                               rtol=1e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
        ),
        s8.params, s1.params,
    )


def test_mvip_step_normal_gating(key):
    """sds_normal contributes 0 before normal_start (reference `nerf/utils.py:298`)."""
    images, masks, depths, poses, focal = _tiny_scene(n_views=2)
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    H, W = images.shape[1:3]
    mc = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
    params = {"coarse": init_nerf_mlp(key, mc), "fine": None}
    apply_fn = lambda p, pts, vd: apply_nerf_mlp(p, mc, pts, vd)

    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))

    ropts = RenderOptions(n_samples=8, n_importance=0, perturb=1.0, raw_noise_std=1.0)
    scfg = StepConfig(n_rand=16, depth_loss=False, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    mcfg = MVIPConfig(is_rgb_guidance=False, is_normal_guidance=True,
                      normal_start=100, normalmap_render_factor=2, normal_k=5,
                      is_colla_guidance=False, render_chunk=64)
    optimizer = make_optimizer(5e-3, 250)
    state = create_train_state(params, optimizer)
    step = make_mvip_train_step(
        scfg, ropts, apply_fn, None, optimizer, mcfg, gm,
        scfg_sds, scfg_sds, scfg_sds, te, te,
    )
    # the step donates its input state; build a fresh one per call
    _, m_before = step(state, streams, key, jnp.asarray(50))
    assert float(m_before["sds_normal"]) == 0.0
    state2 = create_train_state(
        {"coarse": init_nerf_mlp(key, mc), "fine": None}, optimizer
    )
    _, m_after = step(state2, streams, key, jnp.asarray(150))
    assert float(m_after["sds_normal"]) != 0.0


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_mvip_step_with_interval_occupancy(key):
    """Full MVIP step (all three SDS branches) with interval-occupancy
    pruning (occ_cfg set, occ_grid passed as the 5th arg): every render in
    the step prunes; finite losses, params move, and the SAME callable runs
    the unpruned warmup trace when occ_grid is omitted."""
    from mvip_tpu.ops.occupancy import OccupancyConfig, dense_refresh, init_grid

    images, masks, depths, poses, focal = _tiny_scene()
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    H, W = images.shape[1:3]

    mcfg_model = NeRFMLPConfig(depth=2, width=32, multires=4, multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(1), mcfg_model),
        "fine": init_nerf_mlp(jax.random.PRNGKey(2), mcfg_model),
    }
    apply_fn = lambda p, pts, vd: apply_nerf_mlp(p, mcfg_model, pts, vd)

    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))

    ropts = RenderOptions(n_samples=8, n_importance=8, perturb=1.0,
                          raw_noise_std=1.0)
    scfg = StepConfig(n_rand=32, depth_loss=True, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    mcfg = MVIPConfig(
        sds_loss_weight=1e-4,
        is_rgb_guidance=True,
        is_normal_guidance=True, normal_start=0, normalmap_render_factor=2,
        normal_k=5,
        is_colla_guidance=True, colla_n_views=3, colla_render_factor=2,
        render_chunk=64,
    )
    occ_cfg = OccupancyConfig(res=16, bound=6.0, keep=0.5, thresh=1e-3,
                              n_probe=16**3, warmup=0, mode="interval")
    grid = dense_refresh(
        init_grid(occ_cfg),
        lambda pts: jnp.full(pts.shape[:-1], 1.0), key, occ_cfg, passes=4,
    )
    optimizer = make_optimizer(5e-3, 250)
    state = create_train_state(params, optimizer)
    step = make_mvip_train_step(
        scfg, ropts, apply_fn, apply_fn, optimizer, mcfg, gm,
        scfg_sds, scfg_sds, scfg_sds, te, te, occ_cfg=occ_cfg,
    )

    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), state.params)
    # warmup trace (no grid) then the pruned trace
    state, m0 = step(state, streams, jax.random.fold_in(key, 0),
                     jnp.asarray(1))
    state, metrics = step(state, streams, jax.random.fold_in(key, 1),
                          jnp.asarray(2), grid)
    for k in ("loss", "sds_rgb", "sds_normal", "sds_colla"):
        assert np.isfinite(float(m0[k])), f"warmup {k}"
        assert np.isfinite(float(metrics[k])), f"pruned {k}"
    moved = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()) > 0,
                     state.params, p0)
    )
    assert any(moved)


def test_mvip_megastep_with_occupancy_matches_stride1(key):
    """Guidance megastep (n_inner=2) COMBINED with interval-occupancy pruning
    must produce the same params as two pruned stride-1 dispatches — the scan
    carry threads the occ grid through every inner step (the combination the
    CLI runs with `--megastep N --occ_grid`)."""
    from mvip_tpu.ops.occupancy import OccupancyConfig, dense_refresh, init_grid

    images, masks, depths, poses, focal = _tiny_scene()
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    H, W = images.shape[1:3]
    mcfg_model = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(1), mcfg_model),
        "fine": None,
    }
    apply_fn = lambda p, pts, vd: apply_nerf_mlp(p, mcfg_model, pts, vd)
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))
    ropts = RenderOptions(n_samples=6, n_importance=0, perturb=1.0,
                          raw_noise_std=0.0)
    scfg = StepConfig(n_rand=16, depth_loss=False, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    mcfg = MVIPConfig(sds_loss_weight=1e-4, is_rgb_guidance=True,
                      render_chunk=64)
    occ_cfg = OccupancyConfig(res=16, bound=6.0, keep=0.5, thresh=1e-3,
                              n_probe=16**3, warmup=0, mode="interval")
    grid = dense_refresh(
        init_grid(occ_cfg),
        lambda pts: jnp.full(pts.shape[:-1], 1.0), key, occ_cfg, passes=4,
    )
    optimizer = make_optimizer(5e-3, 250)
    args = (scfg, ropts, apply_fn, None, optimizer, mcfg, gm,
            scfg_sds, scfg_sds, scfg_sds, te, te)

    step1 = make_mvip_train_step(*args, occ_cfg=occ_cfg)
    scan2 = make_mvip_train_step(*args, occ_cfg=occ_cfg, n_inner=2)

    p_host = jax.tree.map(lambda a: np.asarray(a).copy(), params)
    fresh = lambda: jax.tree.map(jnp.asarray, p_host)

    s_a = create_train_state(fresh(), optimizer)
    base = jax.random.fold_in(key, 9)
    for j in range(2):
        s_a, m_a = step1(s_a, streams, jax.random.fold_in(base, j),
                         jnp.asarray(4 + j, jnp.int32), grid)

    s_b = create_train_state(fresh(), optimizer)
    s_b, m_b = scan2(s_b, streams, base, jnp.asarray(4, jnp.int32), grid)

    assert int(s_b.step) == int(s_a.step) == 2
    for la, lb in zip(jax.tree_util.tree_leaves(s_a.params),
                      jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=2e-5, atol=2e-6)


def test_mvip_step_guidance_params_not_baked_as_constants(key):
    """Guidance weights must enter the jitted MVIP step as ARGUMENTS.

    Regression for a production-scale defect: `make_mvip_train_step` used to
    close over `gm`, so jit baked the UNet/VAE params into the lowered module
    as literal constants — harmless at test scale, but at real SD-1.5 scale
    it duplicated 3.6 GB of HBM (params resident once as arrays, again inside
    the executable). Pin the property by lowering with JAX's captured-constants
    warning threshold set below the guidance-param byte count and asserting
    the warning does not fire.
    """
    import warnings

    images, masks, depths, poses, focal = _tiny_scene()
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    H, W = images.shape[1:3]
    mcfg_model = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(1), mcfg_model),
        "fine": None,
    }
    apply_fn = lambda p, pts, vd: apply_nerf_mlp(p, mcfg_model, pts, vd)
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    gm_bytes = sum(
        a.size * a.dtype.itemsize
        for a in jax.tree_util.tree_leaves((gm.unet_params, gm.vae_params))
    )
    assert gm_bytes > 64 * 1024  # the threshold below must be meaningful
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))
    ropts = RenderOptions(n_samples=6, n_importance=0, perturb=0.0,
                          raw_noise_std=0.0)
    scfg = StepConfig(n_rand=16, depth_loss=False, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    mcfg = MVIPConfig(sds_loss_weight=1e-4, is_rgb_guidance=True,
                      render_chunk=64)
    optimizer = make_optimizer(5e-3, 250)
    step = make_mvip_train_step(
        scfg, ropts, apply_fn, None, optimizer, mcfg, gm,
        scfg_sds, scfg_sds, scfg_sds, te, te,
    )
    state = create_train_state(params, optimizer)

    prev = jax.config.jax_captured_constants_warn_bytes
    jax.config.update("jax_captured_constants_warn_bytes", gm_bytes // 2)
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            state, metrics = step(state, streams, key, jnp.asarray(1))
            jax.block_until_ready(metrics["loss"])
        baked = [str(w.message) for w in caught
                 if "constants were captured" in str(w.message)]
        assert not baked, f"guidance params baked into the program: {baked}"
    finally:
        jax.config.update("jax_captured_constants_warn_bytes", prev)
    assert np.isfinite(float(metrics["loss"]))


def test_sds_coords_block_reduction():
    """sds_render_factor=2 coords: a low-res pixel is masked iff ANY pixel of
    its 2x2 block is masked; coords stay inside (H//2, W//2) and pad with the
    last valid pixel."""
    images, masks, depths, poses, focal = _tiny_scene()
    s = build_ray_streams(images, masks, depths, poses, focal,
                          sds_render_factor=2)
    N, H, W = masks.shape
    Hs, Ws = H // 2, W // 2
    blocks = masks[:, : Hs * 2, : Ws * 2].reshape(N, Hs, 2, Ws, 2)
    expect = (blocks == 1).any((2, 4))
    assert (s.sds_counts == expect.reshape(N, -1).sum(-1)).all()
    for v in range(N):
        got = np.zeros((Hs, Ws), bool)
        k = int(s.sds_counts[v])
        got[s.sds_coords[v, :k, 1], s.sds_coords[v, :k, 0]] = True
        assert (got == expect[v]).all()
        # padding repeats the last valid pixel (renders harmlessly)
        if k < s.sds_coords.shape[1]:
            assert (s.sds_coords[v, k:] == s.sds_coords[v, k - 1]).all()
    # factor 1: the reduced-res stream is empty (reference-exact path)
    s1 = build_ray_streams(images, masks, depths, poses, focal)
    assert s1.sds_coords.shape == (N, 0, 2) and (s1.sds_counts == 0).all()


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_mvip_step_sds_render_factor(key):
    """The reduced-res RGB-SDS path (sds_render_factor=2) runs the full step,
    produces finite metrics, and moves the params — with ~4x fewer guidance
    rays than the full-res masked render."""
    images, masks, depths, poses, focal = _tiny_scene()
    host = build_ray_streams(images, masks, depths, poses, focal,
                             sds_render_factor=2)
    assert host.sds_coords.shape[1] < host.masked_coords.shape[1]
    streams = DeviceStreams.from_host(host)
    H, W = images.shape[1:3]
    mcfg_model = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(1), mcfg_model),
        "fine": None,
    }
    apply_fn = lambda p, pts, vd: apply_nerf_mlp(p, mcfg_model, pts, vd)
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))
    # raw_noise_std keeps sigma gradients alive on the tiny random-init model
    # (without it every sampled raw sigma can sit in ReLU's dead half and the
    # whole step has exactly-zero gradient — renders all-black, grads stuck)
    ropts = RenderOptions(n_samples=6, n_importance=0, perturb=1.0,
                          raw_noise_std=1.0)
    scfg = StepConfig(n_rand=16, depth_loss=False, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    mcfg = MVIPConfig(is_rgb_guidance=True, is_normal_guidance=False,
                      is_colla_guidance=False, render_chunk=32,
                      sds_render_factor=2)
    optimizer = make_optimizer(5e-3, 250)
    state = create_train_state(params, optimizer)
    step = make_mvip_train_step(
        scfg, ropts, apply_fn, None, optimizer, mcfg, gm,
        scfg_sds, scfg_sds, scfg_sds, te, te,
    )
    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), state.params)
    for i in range(2):
        state, metrics = step(state, streams, jax.random.fold_in(key, i),
                              jnp.asarray(i + 1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["sds_rgb"])) and float(metrics["sds_rgb"]) > 0
    moved = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()) > 0,
                     state.params, p0)
    )
    assert any(moved)


def test_mvip_step_fuse_guidance_renders_matches_unfused(key):
    """fuse_guidance_renders=True concatenates the normal-view and colla
    ray grids into ONE dispatch. With deterministic rendering (perturb=0,
    raw_noise_std=0) the only behavioral difference — PRNG stream grouping
    inside the renders — vanishes, so the fused step must reproduce the
    unfused step's loss, SDS metrics, and updated params exactly."""
    images, masks, depths, poses, focal = _tiny_scene()
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    H, W = images.shape[1:3]
    mcfg_model = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(1), mcfg_model),
        "fine": init_nerf_mlp(jax.random.PRNGKey(2), mcfg_model),
    }
    apply_fn = lambda p, pts, vd: apply_nerf_mlp(p, mcfg_model, pts, vd)
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))
    ropts = RenderOptions(n_samples=6, n_importance=4, perturb=0.0,
                          raw_noise_std=0.0)
    scfg = StepConfig(n_rand=16, depth_loss=False, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    base = dict(
        sds_loss_weight=1e-4,
        is_rgb_guidance=True,
        is_normal_guidance=True, normal_start=0, normalmap_render_factor=2,
        normal_k=5,
        is_colla_guidance=True, colla_n_views=3, colla_render_factor=2,
        render_chunk=64,
    )
    optimizer = make_optimizer(5e-3, 250)

    results = {}
    for fuse in (False, True):
        mcfg = MVIPConfig(fuse_guidance_renders=fuse, **base)
        step = make_mvip_train_step(
            scfg, ropts, apply_fn, apply_fn, optimizer, mcfg, gm,
            scfg_sds, scfg_sds, scfg_sds, te, te,
        )
        # fresh COPIES each variant: the step donates the state, so reusing
        # the same leaves across variants would hit deleted arrays
        state = create_train_state(
            jax.tree.map(jnp.copy, params), optimizer
        )
        state, metrics = step(state, streams, key, jnp.asarray(1))
        results[fuse] = (jax.device_get(state.params),
                         {k: float(v) for k, v in metrics.items()})

    p_ref, m_ref = results[False]
    p_fuse, m_fuse = results[True]
    for k in ("loss", "sds_rgb", "sds_normal", "sds_colla"):
        assert np.isfinite(m_ref[k])
        np.testing.assert_allclose(m_fuse[k], m_ref[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fuse)):
        if a is None:
            continue
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow  # 3 jitted step variants (~80 s CPU): full suite only
def test_mvip_step_occ_keep_guidance(key):
    """`occ_keep_guidance` prunes the GUIDANCE renders harder while the base
    losses keep occ_cfg.keep (config.py `occ_keep_guidance` — the config-5
    throughput lever: guidance renders are >98% of the step's sample load).
    Checks: (a) a value equal to occ_keep is bit-identical to inheriting,
    (b) a tighter value changes the guidance losses but leaves the base
    image loss untouched (same keys, same base pruner)."""
    import dataclasses

    from mvip_tpu.ops.occupancy import OccupancyConfig, dense_refresh, init_grid

    images, masks, depths, poses, focal = _tiny_scene()
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    H, W = images.shape[1:3]
    mcfg_model = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(1), mcfg_model),
        "fine": init_nerf_mlp(jax.random.PRNGKey(2), mcfg_model),
    }
    apply_fn = lambda p, pts, vd: apply_nerf_mlp(p, mcfg_model, pts, vd)

    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))

    ropts = RenderOptions(n_samples=16, n_importance=8, perturb=1.0,
                          raw_noise_std=1.0)
    scfg = StepConfig(n_rand=16, depth_loss=False, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    occ_cfg = OccupancyConfig(res=16, bound=6.0, keep=0.5, thresh=1e-3,
                              n_probe=16**3, warmup=0, mode="interval")
    grid = dense_refresh(
        init_grid(occ_cfg),
        lambda pts: jnp.full(pts.shape[:-1], 1.0), key, occ_cfg, passes=4,
    )
    optimizer = make_optimizer(5e-3, 250)

    def run(keep_g):
        mcfg = MVIPConfig(
            is_rgb_guidance=True, is_normal_guidance=True, normal_start=0,
            normalmap_render_factor=2, normal_k=5, is_colla_guidance=False,
            render_chunk=64, occ_keep_guidance=keep_g,
        )
        step = make_mvip_train_step(
            scfg, ropts, apply_fn, apply_fn, optimizer, mcfg, gm,
            scfg_sds, scfg_sds, scfg_sds, te, te, occ_cfg=occ_cfg,
        )
        state = create_train_state(jax.tree.map(jnp.copy, params), optimizer)
        _, metrics = step(state, streams, key, jnp.asarray(5), grid)
        return {k: float(v) for k, v in metrics.items()}

    m_inherit = run(0.0)
    m_same = run(occ_cfg.keep)     # same K -> identical program
    m_tight = run(0.25)            # K 12 -> 6 on the fine ladder

    for k in ("loss", "img_loss", "sds_rgb", "sds_normal"):
        assert np.isfinite(m_inherit[k]), k
        assert np.isfinite(m_tight[k]), k
        np.testing.assert_allclose(m_same[k], m_inherit[k], rtol=0, atol=0,
                                   err_msg=k)
    # base render untouched by the guidance keep; guidance losses change
    np.testing.assert_allclose(m_tight["img_loss"], m_inherit["img_loss"],
                               rtol=0, atol=0)
    assert m_tight["sds_rgb"] != m_inherit["sds_rgb"]
