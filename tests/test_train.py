"""End-to-end training tests on a tiny synthetic scene: the train step runs,
the loss decreases, checkpoints round-trip — coverage the reference never had
(SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvip_tpu.data.rays import build_ray_streams
from mvip_tpu.models.nerf_mlp import NeRFMLPConfig, apply_nerf_mlp, init_nerf_mlp
from mvip_tpu.render.renderer import RenderOptions
from mvip_tpu.train.state import create_train_state, make_optimizer
from mvip_tpu.train.step import DeviceStreams, StepConfig, make_train_step

pytestmark = pytest.mark.slow  # full fits/e2e: excluded from the fast `-m "not slow"` gate


def make_synthetic_scene(n_views=3, H=24, W=32, seed=0):
    """Views of a constant-color world with a centered 'mask' square."""
    rng = np.random.default_rng(seed)
    images = np.tile(
        np.linspace(0.2, 0.8, W, dtype=np.float32)[None, None, :, None], (n_views, H, 1, 3)
    )
    masks = np.zeros((n_views, H, W), np.float32)
    masks[:, H // 3 : 2 * H // 3, W // 3 : 2 * W // 3] = 1.0
    depths = np.full((n_views, H, W), 0.5, np.float32)
    poses = np.zeros((n_views, 3, 4), np.float32)
    for v in range(n_views):
        th = v * 0.2
        c, s = np.cos(th), np.sin(th)
        poses[v, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        poses[v, :3, 3] = [s * 4, 0, c * 4]
    focal = 30.0
    return images, masks, depths, poses, focal


_MCFG = NeRFMLPConfig(depth=2, width=32, multires=4, multires_views=2)
_APPLY = lambda p, pts, vd: apply_nerf_mlp(p, _MCFG, pts, vd)
_OPT = make_optimizer(5e-3, 250)


@pytest.fixture(scope="module")
def tiny_setup():
    """Module-scoped step+streams (compile once); per-test FRESH state, because the
    jitted step donates its state argument (donate_argnums) and a donated buffer
    cannot be reused across tests."""
    images, masks, depths, poses, focal = make_synthetic_scene()
    streams = build_ray_streams(images, masks, depths, poses, focal)
    H, W = images.shape[1:3]
    ropts = RenderOptions(n_samples=8, n_importance=8, perturb=1.0, white_bkgd=False)
    scfg = StepConfig(
        n_rand=128, depth_loss=True, near=2.0, far=6.0, H=H, W=W, focal=focal
    )
    step = make_train_step(scfg, ropts, _APPLY, _APPLY, _OPT)

    def make_state():
        params = {
            "coarse": init_nerf_mlp(jax.random.PRNGKey(1), _MCFG),
            "fine": init_nerf_mlp(jax.random.PRNGKey(2), _MCFG),
        }
        return create_train_state(params, _OPT)

    return make_state, step, DeviceStreams.from_host(streams)


def test_train_step_runs_and_loss_decreases(tiny_setup):
    make_state, step, streams = tiny_setup
    state = make_state()
    key = jax.random.PRNGKey(0)
    first = None
    losses = []
    for i in range(60):
        state, metrics = step(state, streams, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    assert np.isfinite(losses).all()
    assert last < first, f"loss did not decrease: {first} -> {last}"
    assert int(state.step) == 60


def test_train_metrics_shapes(tiny_setup):
    make_state, step, streams = tiny_setup
    state = make_state()
    state, metrics = step(state, streams, jax.random.PRNGKey(9))
    for k in ("loss", "img_loss", "depth_loss", "psnr"):
        assert metrics[k].shape == ()
        assert np.isfinite(float(metrics[k]))


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    from mvip_tpu.train.checkpoint import CheckpointManager

    make_state, step, streams = tiny_setup
    state, _ = step(make_state(), streams, jax.random.PRNGKey(3))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    host_state = jax.device_get(state)
    mgr.save(host_state)
    assert mgr.latest_step() == int(state.step)
    restored = mgr.restore(host_state)
    assert int(restored.step) == int(state.step)
    a = jax.tree.leaves(restored.params)
    b = jax.tree.leaves(host_state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    mgr.close()


def test_train_scan_runs_and_advances(tiny_setup):
    """Megastep scan: 4 inner steps in one dispatch; step count advances, loss
    finite, params move."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvip_tpu.models.nerf_mlp import NeRFMLPConfig
    from mvip_tpu.train.step import make_train_scan
    from tests.test_train import _APPLY, _MCFG, _OPT, make_synthetic_scene
    from mvip_tpu.data.rays import build_ray_streams
    from mvip_tpu.render.renderer import RenderOptions
    from mvip_tpu.train.state import create_train_state
    from mvip_tpu.train.step import DeviceStreams, StepConfig
    from mvip_tpu.models.nerf_mlp import init_nerf_mlp

    make_state, _, streams = tiny_setup
    images, masks, depths, poses, focal = make_synthetic_scene()
    H, W = images.shape[1:3]
    ropts = RenderOptions(n_samples=8, n_importance=8, perturb=1.0,
                          raw_noise_std=1.0, white_bkgd=False)
    scfg = StepConfig(n_rand=128, depth_loss=True, near=2.0, far=6.0,
                      H=H, W=W, focal=focal)
    scan = make_train_scan(scfg, ropts, _APPLY, _APPLY, _OPT, n_inner=4)
    state = make_state()
    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), state.params)
    state, metrics = scan(state, streams, jax.random.PRNGKey(42))
    assert int(state.step) == 4
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()) > 0, state.params, p0)
    )
    assert any(moved)


def test_ft_path_restore(tmp_path, tiny_setup):
    """--ft_path pins a specific checkpoint (reference run.py:1546-1547)."""
    import jax
    import numpy as np

    from mvip_tpu.train.checkpoint import CheckpointManager, restore_from_path

    make_state, step, streams = tiny_setup
    state = make_state()
    state, _ = step(state, streams, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(jax.device_get(state))
    ckpt.close()

    # by manager dir and by explicit step dir
    for path in (str(tmp_path / "ckpt"), str(tmp_path / "ckpt" / "1")):
        restored = restore_from_path(path, make_state())
        assert int(restored.step) == 1
        a = jax.tree_util.tree_leaves(restored.params)[0]
        b = jax.tree_util.tree_leaves(state.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
