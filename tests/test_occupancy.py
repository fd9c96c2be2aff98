"""Occupancy-grid sample pruning (ops/occupancy.py).

Strategy mirrors the repo's oracle pattern: the pruned render must reproduce
the unpruned render wherever the grid is conservative (the skipped samples
carry zero density), and the estimator pieces (cell indexing, EMA refresh,
static-shape compaction) get direct unit checks. TPU-first addition — no
reference counterpart (`DS_NeRF/run.py:1703-1847` always evaluates all
64+64 samples).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.ops.occupancy import (
    OccupancyConfig,
    dense_refresh,
    init_grid,
    make_pruner,
    occ_lookup,
    update_grid,
)
from mvip_tpu.render.renderer import RenderOptions, render_rays


CFG = OccupancyConfig(res=32, bound=4.0, keep=0.5, thresh=0.01,
                      n_probe=32**3, update_every=4, warmup=0, mode="topk")
CFG_INT = OccupancyConfig(res=32, bound=4.0, keep=0.5, thresh=0.01,
                          n_probe=32**3, update_every=4, warmup=0,
                          mode="interval")


def _slab_sigma(pts):
    """Analytic density: a dense slab 1.0 < z < 2.0, empty elsewhere."""
    z = pts[..., 2]
    return jnp.where((z > 1.0) & (z < 2.0), 25.0, 0.0)


def _slab_model(pts, viewdirs):
    sig = _slab_sigma(pts)
    rgb = jnp.stack(
        [jnp.full_like(sig, 2.0), jnp.full_like(sig, -2.0),
         jnp.clip(pts[..., 2], -3.0, 3.0)], -1
    )
    return jnp.concatenate([rgb, sig[..., None]], -1)


def _built_grid():
    grid = init_grid(CFG)
    return dense_refresh(grid, _slab_sigma, jax.random.PRNGKey(0), CFG,
                         passes=12)


def test_update_grid_marks_slab_and_decays_elsewhere():
    grid = _built_grid()
    g3 = np.asarray(grid).reshape(CFG.res, CFG.res, CFG.res)
    # cell layer containing z in (1, 2): z01 = (z+4)/8 -> k in [20, 24)
    assert g3[:, :, 21:23].min() > 1.0       # slab cells saw density 25
    assert g3[:, :, :19].max() == 0.0        # empty space never marked
    # decay-only pass drives the EMA down where nothing is probed
    g2 = update_grid(grid, lambda p: jnp.zeros(p.shape[0]),
                     jax.random.PRNGKey(1), CFG)
    assert float(jnp.max(g2)) <= float(jnp.max(grid)) * CFG.decay + 1e-6


def test_occ_lookup_matches_analytic_field():
    grid = _built_grid()
    pts = jnp.asarray([[0.0, 0.0, 1.5], [0.0, 0.0, 3.5], [2.0, -2.0, 1.4]])
    occ = occ_lookup(grid, pts, CFG)
    assert occ[0] > 1.0 and occ[2] > 1.0 and occ[1] < 0.01


def test_pruner_static_shape_and_depth_order():
    grid = _built_grid()
    pruner = make_pruner(grid, CFG)
    ro = jnp.zeros((16, 3)).at[:, 2].set(-4.0)
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (16, 3))
    z = jnp.broadcast_to(jnp.linspace(0.1, 7.9, 64), (16, 64))
    zp, dp = pruner(ro, rd, z)
    assert zp.shape == (16, 32)                       # ceil(64 * 0.5), static
    assert dp.shape == (16, 32)
    assert bool(jnp.all(jnp.diff(zp, axis=-1) >= 0))  # depth-monotone
    # every kept sample carries its ORIGINAL stratum width (uniform ladder
    # except the 1e10 tail marker)
    step = float(z[0, 1] - z[0, 0])
    dpn = np.asarray(dp)
    assert np.all((np.abs(dpn - step) < 1e-5) | (dpn == 1e10))
    # every sample that lands inside the slab must survive compaction
    keptz = np.asarray(ro[0, 2] + zp[0])
    inz = np.asarray(ro[0, 2] + z[0])
    want = inz[(inz > 1.0) & (inz < 2.0)]
    assert np.all(np.isin(np.round(want, 5), np.round(keptz, 5)))


def test_pruned_render_exact_on_conservative_grid():
    """Single-stage render: compaction must reproduce the full render EXACTLY
    (float tolerance) because discarded samples all have sigma == 0 and kept
    samples keep their original stratum widths."""
    grid = _built_grid()
    ro = jnp.stack(
        [jnp.linspace(-2.0, 2.0, 32), jnp.zeros(32), jnp.full((32,), -4.0)], -1
    )
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (32, 3))
    base = RenderOptions(n_samples=64, n_importance=0, perturb=0.0,
                         use_pallas=False)
    ref = render_rays(None, ro, rd, 0.1, 7.9, _slab_model, None, base)
    out = render_rays(None, ro, rd, 0.1, 7.9, _slab_model, None,
                      RenderOptions(n_samples=64, n_importance=0, perturb=0.0,
                                    use_pallas=False,
                                    pruner=make_pruner(grid, CFG)))
    for k in ("rgb", "depth", "disp", "acc"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), atol=1e-5,
            err_msg=f"map {k} diverged under conservative pruning",
        )


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_pruned_hierarchical_render_close():
    """Coarse+fine: pruning the coarse stage perturbs the importance-sampling
    bin edges (zero-weight spans collapse), so the fine render is only
    near-identical — but must stay close on a conservative grid."""
    grid = _built_grid()
    ro = jnp.stack(
        [jnp.linspace(-2.0, 2.0, 32), jnp.zeros(32), jnp.full((32,), -4.0)], -1
    )
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (32, 3))
    base = RenderOptions(n_samples=48, n_importance=32, perturb=0.0,
                         use_pallas=False)
    ref = render_rays(None, ro, rd, 0.1, 7.9, _slab_model, _slab_model, base)
    out = render_rays(None, ro, rd, 0.1, 7.9, _slab_model, _slab_model,
                      RenderOptions(n_samples=48, n_importance=32, perturb=0.0,
                                    use_pallas=False,
                                    pruner=make_pruner(grid, CFG)))
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]), np.asarray(ref["depth"]), atol=5e-2
    )


def test_interval_mode_narrows_to_occupied_span():
    """Interval mode: kept samples concentrate in the slab's z-span (plus one
    stratum margin); empty rays keep the full span."""
    grid = _built_grid()
    pruner = make_pruner(grid, CFG_INT)
    ro = jnp.zeros((2, 3)).at[:, 2].set(-4.0)
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (2, 3))
    z = jnp.broadcast_to(jnp.linspace(0.1, 7.9, 64), (2, 64))
    zp, dp = pruner(ro, rd, z)
    assert zp.shape == (2, 32) and dp.shape == (2, 32)
    assert bool(jnp.all(jnp.diff(zp, axis=-1) >= 0))
    # ray 0 crosses the slab (world z in (1,2) -> ray z in (5,6)); the
    # narrowed ladder must sit inside that span plus a one-stratum margin
    step = float(z[0, 1] - z[0, 0])
    assert float(zp[0, 0]) >= 5.0 - 2 * step
    assert float(zp[0, -1]) <= 6.0 + 2 * step
    # narrowed sampling is FINER than the original ladder inside content
    assert float(jnp.max(jnp.diff(zp[0]))) < step


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_interval_mode_beats_plain_ladder_accuracy():
    """The point of interval mode: K=24 samples concentrated in the occupied
    span reproduce a 512-sample dense reference BETTER than the full 48-sample
    uniform ladder does — quality above baseline at half the query cost."""
    grid = _built_grid()
    ro = jnp.stack(
        [jnp.linspace(-2.0, 2.0, 64), jnp.zeros(64), jnp.full((64,), -4.0)], -1
    )
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (64, 3))

    def render(n_samples, pruner=None):
        opts = RenderOptions(n_samples=n_samples, n_importance=0, perturb=0.0,
                             use_pallas=False, pruner=pruner)
        return render_rays(None, ro, rd, 0.1, 7.9, _slab_model, None, opts)

    dense = render(512)["rgb"]
    full = render(48)["rgb"]
    pruned = render(48, make_pruner(grid, CFG_INT))["rgb"]
    err_full = float(jnp.mean((full - dense) ** 2))
    err_pruned = float(jnp.mean((pruned - dense) ** 2))
    assert err_pruned < err_full, (err_pruned, err_full)


def test_train_step_with_occupancy_pruning():
    """Full jitted train step with the pruned renderer (make_train_step's
    occ_cfg path): trains, loss finite and decreasing, grid refresh composes.
    The megastep scan variant compiles and steps too."""
    from tests.test_train import _APPLY, _MCFG, _OPT, make_synthetic_scene

    from mvip_tpu.data.rays import build_ray_streams
    from mvip_tpu.models.nerf_mlp import init_nerf_mlp
    from mvip_tpu.ops.occupancy import sigma_fn_from_apply
    from mvip_tpu.train.state import create_train_state
    from mvip_tpu.train.step import (
        DeviceStreams,
        StepConfig,
        make_train_scan,
        make_train_step,
    )

    images, masks, depths, poses, focal = make_synthetic_scene()
    streams = DeviceStreams.from_host(
        build_ray_streams(images, masks, depths, poses, focal)
    )
    H, W = images.shape[1:3]
    ropts = RenderOptions(n_samples=8, n_importance=8, perturb=1.0,
                          use_pallas=False)
    scfg = StepConfig(n_rand=64, depth_loss=True, near=2.0, far=6.0, H=H, W=W,
                      focal=focal)
    occ = OccupancyConfig(res=16, bound=6.0, keep=0.5, thresh=1e-3,
                          update_every=4, n_probe=4096, warmup=0)
    step = make_train_step(scfg, ropts, _APPLY, _APPLY, _OPT, occ_cfg=occ)

    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(1), _MCFG),
        "fine": init_nerf_mlp(jax.random.PRNGKey(2), _MCFG),
    }
    state = create_train_state(params, _OPT)
    grid = init_grid(occ)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        if i % occ.update_every == 0:
            grid = update_grid(
                grid, sigma_fn_from_apply(_APPLY, state.params["fine"]),
                jax.random.fold_in(key, 1000 + i), occ,
            )
        state, metrics = step(state, streams, jax.random.fold_in(key, i), grid)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert int(state.step) == 30

    scan = make_train_scan(scfg, ropts, _APPLY, _APPLY, _OPT, n_inner=3,
                           occ_cfg=occ)
    state, metrics = scan(state, streams, jax.random.fold_in(key, 99), grid)
    assert int(state.step) == 33
    assert np.isfinite(float(metrics["loss"]))


def test_pruner_keep_one_is_identity():
    grid = _built_grid()
    pruner = make_pruner(grid, OccupancyConfig(res=32, bound=4.0, keep=1.0))
    z = jnp.broadcast_to(jnp.linspace(0.1, 7.9, 16), (4, 16))
    ro = jnp.zeros((4, 3))
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4, 3))
    zp, dp = pruner(ro, rd, z)
    assert dp is None
    np.testing.assert_array_equal(np.asarray(zp), np.asarray(z))


def test_pruner_alignment_quantum():
    """Fused callers request K + append on a multiple of `quantum` (the
    Mosaic ladder-length cliff: 13.7-22x at S=33/49 vs 32/48, BASELINE.md);
    rounding must go UP (never drop below ceil(S*keep)) and collapse to the
    unpruned passthrough when it reaches S."""
    grid = _built_grid()
    ro = jnp.zeros((4, 3))
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4, 3))
    for S, keep, quantum, append in [(64, 0.5, 8, 1), (96, 0.5, 8, 1),
                                     (64, 0.3, 8, 1), (33, 0.5, 8, 1)]:
        cfg = OccupancyConfig(res=16, bound=4.0, keep=keep, thresh=1e-3,
                              mode="interval")
        pruner = make_pruner(grid, cfg, append=append, quantum=quantum)
        z = jnp.broadcast_to(jnp.linspace(0.1, 7.9, S), (4, S))
        zp, dp = pruner(ro, rd, z)
        K = zp.shape[-1]
        if dp is None:
            assert K == S        # rounded to/past S -> unpruned passthrough
        else:
            assert (K + append) % quantum == 0
            assert K >= math.ceil(S * keep)
            assert K < S


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_fused_mlp_hier_pruned_matches_xla_renderer():
    """The fused-megakernel hierarchical render with an interval pruner
    (phantom-sample last-width trick, `ops/occupancy.phantom_ladder`) must
    reproduce `render_rays` with the SAME pruner in deterministic mode —
    same ladders, same importance draws, phantom contributes exactly zero."""
    from mvip_tpu.models.nerf_mlp import (
        NeRFMLPConfig, apply_nerf_mlp, init_nerf_mlp,
    )
    from mvip_tpu.ops.pallas_render_grad import fused_train_hier_render

    mcfg = NeRFMLPConfig(depth=2, width=32, skips=(), multires=4,
                         multires_views=2)
    params = init_nerf_mlp(jax.random.PRNGKey(3), mcfg)
    grid = _built_grid()
    pruner = make_pruner(grid, CFG_INT)
    ro = jnp.stack(
        [jnp.linspace(-2.0, 2.0, 16), jnp.zeros(16), jnp.full((16,), -4.0)], -1
    )
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (16, 3))

    def fn(pts, vd):
        return apply_nerf_mlp(params, mcfg, pts, vd)

    opts = RenderOptions(n_samples=32, n_importance=16, perturb=0.0,
                         raw_noise_std=0.0, white_bkgd=True,
                         use_pallas=False, pruner=pruner)
    ref = render_rays(jax.random.PRNGKey(5), ro, rd, 0.1, 7.9, fn, fn, opts)
    out = fused_train_hier_render(
        jax.random.PRNGKey(5), params, params, mcfg, ro, rd, 0.1, 7.9,
        32, 16, perturb=0.0, raw_noise_std=0.0, white_bkgd=True,
        interpret=True, pruner=pruner,
    )
    for k in ("rgb", "depth", "acc"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), atol=2e-4,
            err_msg=f"fused pruned map {k} diverged from XLA",
        )


@pytest.mark.slow
def test_fused_hash_hier_pruned_matches_xla_renderer():
    """Hash-grid twin of the test above (interpret-mode encode)."""
    from mvip_tpu.models.nerf_hashgrid import (
        HashGridConfig, apply_hashgrid_nerf, init_hashgrid_nerf,
    )
    from mvip_tpu.ops.pallas_hash_render import hash_train_hier_render

    hcfg = HashGridConfig(n_levels=4, log2_table_size=10, bound=4.0,
                          fused=False)
    params = init_hashgrid_nerf(jax.random.PRNGKey(4), hcfg)
    grid = _built_grid()
    pruner = make_pruner(grid, CFG_INT)
    ro = jnp.stack(
        [jnp.linspace(-2.0, 2.0, 8), jnp.zeros(8), jnp.full((8,), -4.0)], -1
    )
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (8, 3))

    def fn(pts, vd):
        return apply_hashgrid_nerf(params, hcfg, pts, vd)

    opts = RenderOptions(n_samples=16, n_importance=8, perturb=0.0,
                         raw_noise_std=0.0, white_bkgd=True,
                         use_pallas=False, pruner=pruner)
    ref = render_rays(jax.random.PRNGKey(6), ro, rd, 0.1, 7.9, fn, fn, opts)
    out = hash_train_hier_render(
        jax.random.PRNGKey(6), params, params, hcfg, ro, rd, 0.1, 7.9,
        16, 8, perturb=0.0, raw_noise_std=0.0, white_bkgd=True,
        interpret=True, pruner=pruner,
    )
    for k in ("rgb", "depth", "acc"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), atol=2e-4,
            err_msg=f"fused hash pruned map {k} diverged from XLA",
        )


def test_pruner_quantum_per_backbone():
    """The ladder-alignment quantum is backbone-specific: the fused PE-MLP
    kernels hit the Mosaic multiple-of-8 cliff (quantum=8); the hash-grid
    kernels measured no cliff, so fewer samples wins (quantum=1). One
    decision point serves mvip_step's guidance renders and fused_step's
    plain fits (BASELINE.md, r2 fourth session)."""
    from mvip_tpu.models.nerf_hashgrid import HashGridConfig
    from mvip_tpu.models.nerf_mlp import NeRFMLPConfig
    from mvip_tpu.ops.occupancy import pruner_quantum

    assert pruner_quantum(NeRFMLPConfig()) == 8
    assert pruner_quantum(HashGridConfig()) == 1
    assert pruner_quantum(None) == 1
