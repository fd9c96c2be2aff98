"""Fused hash-grid training chain (ops/pallas_hash_train.py) vs jax.grad.

Same oracle pattern as tests/test_pallas_train.py: the three-kernel chain
(transposed encode -> MLP/composite/loss/backward -> table gradient), run in
interpret mode here, must reproduce the XLA loss and ALL parameter gradients
(table + sigma/color nets) for identical rays / z / noise / targets / scales.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.models.nerf_hashgrid import (
    HashGridConfig,
    apply_hashgrid_nerf,
    init_hashgrid_nerf,
)
from mvip_tpu.ops.compositing import composite
from mvip_tpu.ops.pallas_hash_train import hash_fused_render_grads

HCFG = HashGridConfig(
    n_levels=4, log2_table_size=10, base_resolution=4, finest_resolution=64.0,
    bound=4.0, sigma_hidden=32, color_hidden=32, fused=False, fused_block=256,
)


def _setup(R=24, S=10, seed=0, noise_std=1.0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 10)
    params = init_hashgrid_nerf(ks[0], HCFG)
    # non-trivial table so table grads exercise real trilinear spreading
    params["table"] = jax.random.uniform(
        ks[7], params["table"].shape, jnp.float32, -0.05, 0.05
    )
    ro = jnp.zeros((R, 3)).at[:, 2].set(3.0)
    rd = jax.random.normal(ks[1], (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(ks[2], (R, S), minval=1.0, maxval=5.0), -1)
    noise = jax.random.normal(ks[3], (R, S)) * noise_std
    t_rgb = jax.random.uniform(ks[4], (R, 3))
    t_disp = jax.random.uniform(ks[5], (R,), minval=0.1, maxval=0.5)
    t_depth = jax.random.uniform(ks[6], (R,), minval=1.0, maxval=5.0)
    s_rgb = jnp.where(jnp.arange(R) < 8, 1.0 / 24.0, 0.0)
    s_disp = jnp.where((jnp.arange(R) >= 8) & (jnp.arange(R) < 16), 0.0125, 0.0)
    s_depth = jnp.where(jnp.arange(R) >= 16, 0.0125, 0.0)
    return params, ro, rd, z, noise, t_rgb, t_disp, t_depth, s_rgb, s_disp, s_depth


def _xla_loss(params, ro, rd, z, noise, t_rgb, t_disp, t_depth,
              s_rgb, s_disp, s_depth, white_bkgd):
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    raw = apply_hashgrid_nerf(params, HCFG, pts, vd)
    out = composite(raw, z, rd, noise=noise, white_bkgd=white_bkgd)
    return (
        jnp.sum(s_rgb * jnp.sum((out.rgb - t_rgb) ** 2, -1))
        + jnp.sum(s_disp * (out.disp - t_disp) ** 2)
        + jnp.sum(s_depth * (out.depth - t_depth) ** 2)
    )


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_hash_fused_chain_matches_jax_grad():
    for white_bkgd in (False, True):
        args = _setup()
        params = args[0]
        metrics, grads = hash_fused_render_grads(
            params, HCFG, *args[1:], white_bkgd=white_bkgd, block_rays=8,
            interpret=True,
        )
        loss_p = metrics["sq_rgb"] + metrics["sq_disp"] + metrics["sq_depth"]
        loss_x, grads_x = jax.value_and_grad(_xla_loss)(
            params, *args[1:], white_bkgd
        )
        np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-5)
        assert set(grads) == set(grads_x)
        flat_p, tdef_p = jax.tree.flatten(grads)
        flat_x, tdef_x = jax.tree.flatten(grads_x)
        assert tdef_p == tdef_x
        scale = max(float(jnp.abs(x).max()) for x in flat_x)
        for gp, gx in zip(flat_p, flat_x):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gx), atol=3e-5 * max(scale, 1.0),
                rtol=2e-4,
            )


def test_hash_fused_weights_match_composite():
    args = _setup(noise_std=0.0)
    params, ro, rd, z, noise = args[:5]
    metrics, _ = hash_fused_render_grads(
        params, HCFG, *args[1:], block_rays=8, interpret=True
    )
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    raw = apply_hashgrid_nerf(params, HCFG, pts, vd)
    out = composite(raw, z, rd, noise=noise)
    np.testing.assert_allclose(
        np.asarray(metrics["weights"]), np.asarray(out.weights), atol=1e-5
    )


def test_hash_fused_step_trains():
    """End-to-end fused step on the hash-grid backbone (interpret mode):
    make_fused_train_step dispatches to the hash kernel chain and the loss
    decreases on a tiny scene."""
    from mvip_tpu.render.renderer import RenderOptions
    from mvip_tpu.train.fused_step import make_fused_train_step
    from mvip_tpu.train.state import create_train_state, make_optimizer
    from mvip_tpu.train.step import StepConfig
    from tests.test_pallas_train import _tiny_scene

    streams, ds, _ = _tiny_scene()
    params = {
        "coarse": init_hashgrid_nerf(jax.random.PRNGKey(1), HCFG),
        "fine": init_hashgrid_nerf(jax.random.PRNGKey(2), HCFG),
    }
    scfg = StepConfig(n_rand=32, depth_loss=True, depth_lambda=0.1,
                      near=1.0, far=7.0, H=16, W=16, focal=20.0)
    ropts = RenderOptions(n_samples=8, n_importance=8, perturb=1.0,
                          raw_noise_std=1.0, white_bkgd=True)
    optimizer = make_optimizer(3e-3, 10)
    state = create_train_state(params, optimizer)
    step = make_fused_train_step(scfg, ropts, HCFG, optimizer, block_rays=16,
                                 interpret=True)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(12):
        state, metrics = step(state, ds, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_hash_hier_render_grad_parity():
    """Stochastic hierarchical guided render on the hash kernels == the XLA
    render_rays under identical RNG draws (outputs + fine-params gradients;
    coarse gets exactly zero gradient)."""
    from mvip_tpu.ops.pallas_hash_render import hash_train_hier_render
    from mvip_tpu.render.renderer import RenderOptions, render_rays

    key = jax.random.PRNGKey(3)
    params_c = init_hashgrid_nerf(jax.random.PRNGKey(1), HCFG)
    params_f = init_hashgrid_nerf(jax.random.PRNGKey(2), HCFG)
    for p in (params_c, params_f):
        p["table"] = jax.random.uniform(
            jax.random.fold_in(key, 5), p["table"].shape, jnp.float32,
            -0.05, 0.05,
        )
    R = 24
    ro = jnp.zeros((R, 3)).at[:, 2].set(3.0)
    rd = jax.random.normal(jax.random.fold_in(key, 1), (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    tgt = jax.random.uniform(jax.random.fold_in(key, 9), (R, 3))
    k_render = jax.random.fold_in(key, 11)

    def loss_fused(pf):
        o = hash_train_hier_render(
            k_render, params_c, pf, HCFG, ro, rd, 1.0, 5.0, 8, 8,
            perturb=1.0, raw_noise_std=1.0, white_bkgd=True, interpret=True,
        )
        return (jnp.mean((o["rgb"] - tgt) ** 2) + 0.05 * jnp.mean(o["depth"])
                + 0.1 * jnp.mean(o["disp"]))

    opts = RenderOptions(n_samples=8, n_importance=8, perturb=1.0,
                         raw_noise_std=1.0, white_bkgd=True, use_pallas=False)

    def loss_ref(both):
        pc, pf = both
        o = render_rays(k_render, ro, rd, 1.0, 5.0,
                        lambda pts, vd: apply_hashgrid_nerf(pc, HCFG, pts, vd),
                        lambda pts, vd: apply_hashgrid_nerf(pf, HCFG, pts, vd),
                        opts)
        return (jnp.mean((o["rgb"] - tgt) ** 2) + 0.05 * jnp.mean(o["depth"])
                + 0.1 * jnp.mean(o["disp"]))

    lf, gf = jax.value_and_grad(loss_fused)(params_f)
    lr, (gr_c, gr_f) = jax.value_and_grad(loss_ref)((params_c, params_f))
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-4)
    assert max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(gr_c)) == 0.0
    flat_f, flat_r = jax.tree.leaves(gf), jax.tree.leaves(gr_f)
    scale = max(float(jnp.abs(x).max()) for x in flat_r)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5 * max(scale, 1.0),
            rtol=2e-4,
        )


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_hash_render_image_matches_direct_render():
    """Full-image eval render (chunked, reshaped) == one direct deterministic
    hierarchical render over the same rays; finite outputs, HxWx3 shape."""
    from mvip_tpu.ops.pallas_hash_render import (
        hash_render_image,
        hash_train_hier_render,
    )
    from mvip_tpu.ops.rays import rays_for_pose

    params = init_hashgrid_nerf(jax.random.PRNGKey(4), HCFG)
    H, W, focal = 6, 9, 8.0
    c2w = jnp.eye(4)[:3, :4].at[2, 3].set(3.0)
    img = hash_render_image(params, params, HCFG, H, W, focal, c2w, 1.0, 5.0,
                            8, 8, white_bkgd=True, chunk=16, interpret=True)
    assert img["rgb"].shape == (H, W, 3)
    assert img["depth"].shape == (H, W)
    for v in img.values():
        assert np.isfinite(np.asarray(v)).all()
    ro, rd = rays_for_pose(H, W, focal, c2w)
    direct = hash_train_hier_render(
        None, params, params, HCFG, ro.reshape(-1, 3), rd.reshape(-1, 3),
        1.0, 5.0, 8, 8, perturb=0.0, raw_noise_std=0.0, white_bkgd=True,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(img["rgb"]).reshape(-1, 3),
                               np.asarray(direct["rgb"]), rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # two full interpret-mode fused hash guidance runs x2 steps
def test_hash_fused_guidance_multichip():
    """shard_map'd fused HASH guidance renders (VERDICT r2 next-round #5): on
    the 8-device CPU mesh, the sharded-ray-axis hash megakernel path of the
    full MVIP step (`train/mvip_step.py` shard_map branch) must reproduce the
    single-device hash path — same loss, same updated params — under
    deterministic rendering (perturb=0, no sigma noise), where the per-device
    key fold-in cannot change any drawn value. This is the multi-device
    exercise of the SHIPPED default backbone's guidance/train path; the
    reference's equivalent is `nn.DataParallel` (`DS_NeRF/run.py:43-46`)."""
    from jax.sharding import Mesh

    from mvip_tpu.data.rays import build_ray_streams
    from mvip_tpu.guidance.sds import SDSConfig, make_guidance_models
    from mvip_tpu.guidance.unet import init_unet, tiny_unet_config
    from mvip_tpu.guidance.vae import init_vae, tiny_vae_config
    from mvip_tpu.render.renderer import RenderOptions
    from mvip_tpu.train.mvip_step import MVIPConfig, make_mvip_train_step
    from mvip_tpu.train.state import create_train_state, make_optimizer
    from mvip_tpu.train.step import DeviceStreams, StepConfig
    from tests.test_mvip_step import _tiny_scene

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(devs[:8]), ("data",))

    key = jax.random.PRNGKey(0)
    images, masks, depths, poses, focal = _tiny_scene()
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    H, W = images.shape[1:3]

    params = {
        "coarse": init_hashgrid_nerf(jax.random.PRNGKey(1), HCFG),
        "fine": init_hashgrid_nerf(jax.random.PRNGKey(2), HCFG),
    }
    apply_fn = lambda p, pts, vd: apply_hashgrid_nerf(p, HCFG, pts, vd)

    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg),
                              ucfg, vcfg)
    scfg_sds = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))

    # deterministic rendering: per-device key fold-in is a no-op
    ropts = RenderOptions(n_samples=8, n_importance=8, perturb=0.0,
                          raw_noise_std=0.0)
    scfg = StepConfig(n_rand=32, depth_loss=True, near=1.0, far=7.0,
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
            fused_mlp_cfg=HCFG, mesh=mesh if use_mesh else None,
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
