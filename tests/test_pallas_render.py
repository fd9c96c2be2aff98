"""Fused render megakernel vs the pure-JAX renderer (oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.models.nerf_mlp import NeRFMLPConfig, apply_nerf_mlp, init_nerf_mlp
from mvip_tpu.ops.pallas_render import fused_render_mlp
from mvip_tpu.ops.sampling import stratified_z_vals
from mvip_tpu.render.renderer import RenderOptions, render_rays


def _setup(key, n_rays=48, n_samples=16):
    cfg = NeRFMLPConfig(depth=4, width=64, skips=(2,), multires=6, multires_views=3)
    params = init_nerf_mlp(key, cfg)
    k1, k2 = jax.random.split(key)
    rays_o = jnp.zeros((n_rays, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(k1, (n_rays, 3))
    d = d.at[:, 2].add(-2.0)
    rays_d = d / jnp.linalg.norm(d, -1, keepdims=True)
    z = stratified_z_vals(None, n_rays, n_samples, 2.0, 6.0, perturb=0.0)
    return cfg, params, rays_o, rays_d, z


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_fused_render_matches_reference(key):
    cfg, params, ro, rd, z = _setup(key)
    interpret = jax.devices()[0].platform != "tpu"
    for wb in (False, True):
        got = fused_render_mlp(params, cfg, ro, rd, z, white_bkgd=wb,
                               block_rays=16, interpret=interpret)

        opts = RenderOptions(n_samples=z.shape[1], n_importance=0, perturb=0.0,
                             raw_noise_std=0.0, white_bkgd=wb)
        model = lambda pts, vd: apply_nerf_mlp(params, cfg, pts, vd)
        # reference path with the same deterministic z placement
        expect = render_rays(None, ro, rd, 2.0, 6.0, model, None, opts)

        np.testing.assert_allclose(np.asarray(got["rgb"]),
                                   np.asarray(expect["rgb"]), atol=3e-4)
        np.testing.assert_allclose(np.asarray(got["depth"]),
                                   np.asarray(expect["depth"]), atol=3e-3)
        np.testing.assert_allclose(np.asarray(got["acc"]),
                                   np.asarray(expect["acc"]), atol=3e-4)
        np.testing.assert_allclose(np.asarray(got["disp"]),
                                   np.asarray(expect["disp"]), atol=3e-3)


def test_fused_render_pads_ragged_ray_count(key):
    cfg, params, ro, rd, z = _setup(key, n_rays=37)
    interpret = jax.devices()[0].platform != "tpu"
    out = fused_render_mlp(params, cfg, ro, rd, z, block_rays=16,
                           interpret=interpret)
    assert out["rgb"].shape == (37, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_fused_hierarchical_matches_reference(key):
    from mvip_tpu.ops.pallas_render import fused_hierarchical_render

    cfg, params, ro, rd, _ = _setup(key, n_rays=32, n_samples=16)
    params_f = init_nerf_mlp(jax.random.fold_in(key, 1), cfg)
    interpret = jax.devices()[0].platform != "tpu"
    got = fused_hierarchical_render(params, params_f, cfg, ro, rd, 2.0, 6.0,
                                    16, 16, block_rays=16, interpret=interpret)

    opts = RenderOptions(n_samples=16, n_importance=16, perturb=0.0,
                         raw_noise_std=0.0, white_bkgd=False)
    expect = render_rays(
        None, ro, rd, 2.0, 6.0,
        lambda pts, vd: apply_nerf_mlp(params, cfg, pts, vd),
        lambda pts, vd: apply_nerf_mlp(params_f, cfg, pts, vd), opts,
    )
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(expect["rgb"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got["rgb0"]),
                               np.asarray(expect["rgb0"]), atol=3e-4)


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_fused_train_render_grad_parity(key):
    """Hand-written backward kernel == jax.grad of the XLA renderer (params-only
    gradients; rays/z are stop-grad in the train step)."""
    from mvip_tpu.ops.pallas_render_grad import fused_train_render

    cfg, params, ro, rd, z = _setup(key, n_rays=32, n_samples=16)
    tgt = jax.random.uniform(jax.random.fold_in(key, 9), (32, 3))
    interpret = jax.devices()[0].platform != "tpu"

    for wb in (False, True):
        def loss_fused(p):
            o = fused_train_render(p, cfg, ro, rd, z, wb, 16, interpret)
            return (jnp.mean((o["rgb"] - tgt) ** 2) + 0.1 * jnp.mean(o["disp"])
                    + 0.05 * jnp.mean(o["depth"]) + 0.02 * jnp.mean(o["acc"]))

        opts = RenderOptions(n_samples=16, n_importance=0, perturb=0.0,
                             raw_noise_std=0.0, white_bkgd=wb)

        def loss_ref(p):
            o = render_rays(None, ro, rd, 2.0, 6.0,
                            lambda pts, vd: apply_nerf_mlp(p, cfg, pts, vd),
                            None, opts)
            return (jnp.mean((o["rgb"] - tgt) ** 2) + 0.1 * jnp.mean(o["disp"])
                    + 0.05 * jnp.mean(o["depth"]) + 0.02 * jnp.mean(o["acc"]))

        lf, gf = jax.value_and_grad(loss_fused)(params)
        lr, gr = jax.value_and_grad(loss_ref)(params)
        np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
        rel = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-8)),
            gf, gr)
        assert max(jax.tree_util.tree_leaves(rel)) < 1e-3

        # fast_bwd (DEFAULT-precision dense matmuls, ~2.7x faster on MXU):
        # same grads within bf16-pass tolerance
        def loss_fast(p):
            o = fused_train_render(p, cfg, ro, rd, z, wb, 16, interpret, True)
            return (jnp.mean((o["rgb"] - tgt) ** 2) + 0.1 * jnp.mean(o["disp"])
                    + 0.05 * jnp.mean(o["depth"]) + 0.02 * jnp.mean(o["acc"]))

        _, gfa = jax.value_and_grad(loss_fast)(params)
        rel = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-8)),
            gfa, gr)
        assert max(jax.tree_util.tree_leaves(rel)) < 3e-2


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_fused_hier_train_render_grad_parity(key):
    """Stochastic hierarchical guided render (the guidance-loss hot path) ==
    the XLA render_rays under identical RNG draws: outputs and fine-params
    gradients match; coarse params get (exactly) zero gradient both ways."""
    from mvip_tpu.ops.pallas_render_grad import fused_train_hier_render

    cfg, params_c, ro, rd, _ = _setup(key, n_rays=32, n_samples=8)
    params_f = init_nerf_mlp(jax.random.fold_in(key, 7), cfg)
    tgt = jax.random.uniform(jax.random.fold_in(key, 9), (32, 3))
    interpret = jax.devices()[0].platform != "tpu"
    k_render = jax.random.fold_in(key, 11)

    def loss_fused(pf):
        o = fused_train_hier_render(
            k_render, params_c, pf, cfg, ro, rd, 2.0, 6.0, 8, 8,
            perturb=1.0, raw_noise_std=1.0, white_bkgd=True,
            interpret=interpret,
        )
        return (jnp.mean((o["rgb"] - tgt) ** 2) + 0.05 * jnp.mean(o["depth"])
                + 0.1 * jnp.mean(o["disp"]))

    opts = RenderOptions(n_samples=8, n_importance=8, perturb=1.0,
                         raw_noise_std=1.0, white_bkgd=True, use_pallas=False)

    def loss_ref(both):
        pc, pf = both
        o = render_rays(k_render, ro, rd, 2.0, 6.0,
                        lambda pts, vd: apply_nerf_mlp(pc, cfg, pts, vd),
                        lambda pts, vd: apply_nerf_mlp(pf, cfg, pts, vd),
                        opts)
        return (jnp.mean((o["rgb"] - tgt) ** 2) + 0.05 * jnp.mean(o["depth"])
                + 0.1 * jnp.mean(o["disp"]))

    lf, gf = jax.value_and_grad(loss_fused)(params_f)
    lr, (gr_c, gr_f) = jax.value_and_grad(loss_ref)((params_c, params_f))
    # identical RNG draws -> same loss up to kernel numerics
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-4)
    # coarse gets no gradient in the guidance loss (importance z detached)
    assert max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(gr_c)) == 0.0
    rel = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-8)),
        gf, gr_f)
    assert max(jax.tree_util.tree_leaves(rel)) < 3e-2
