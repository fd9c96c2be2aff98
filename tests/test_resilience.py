"""Failure containment + data-parallel determinism."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.config import Config
from tests.conftest import run_in_cpu_mesh

pytestmark = pytest.mark.slow  # full fits/e2e: excluded from the fast `-m "not slow"` gate


def test_emergency_checkpoint_on_crash(tmp_path, monkeypatch):
    """A mid-run exception leaves a resumable checkpoint behind."""
    from mvip_tpu.train import loop as L

    images = np.random.default_rng(0).uniform(0, 1, (2, 12, 16, 3)).astype(np.float32)
    masks = np.zeros((2, 12, 16), np.float32)
    masks[:, 4:8, 5:10] = 1
    depths = np.ones((2, 12, 16), np.float32) * 0.5
    poses = np.tile(np.eye(4)[:3], (2, 1, 1)).astype(np.float32)
    poses[:, 2, 3] = 4.0

    # dataset stub so train() needs no scene on disk
    def fake_load_scene(cfg):
        from mvip_tpu.data.rays import build_ray_streams

        streams = build_ray_streams(images, masks, depths, poses, 10.0)
        return (streams, 2.0, 6.0, (12, 16, 10.0), poses, np.arange(2),
                np.array([0]), poses[:1], images[:1])

    monkeypatch.setattr(L, "load_scene", fake_load_scene)

    cfg = Config(
        expname="crash", basedir=str(tmp_path), N_rand=8, N_samples=4,
        N_importance=0, no_tcnn=True, netdepth=2, netwidth=16, multires=2,
        multires_views=2, depth_loss=False, N_iters=50, i_print=5, i_weights=100,
        i_video=0, i_testset=0, raw_noise_std=1.0, second_stage=False,
    )

    calls = {"n": 0}
    orig = L.make_train_step

    def exploding_make(*a, **kw):
        step = orig(*a, **kw)

        def wrapped(state, streams, key):
            calls["n"] += 1
            if calls["n"] > 10:
                raise RuntimeError("injected fault")
            return step(state, streams, key)

        return wrapped

    monkeypatch.setattr(L, "make_train_step", exploding_make)

    import pytest

    with pytest.raises(RuntimeError, match="injected fault"):
        L.train(cfg, log_fn=lambda *_: None)

    # an emergency checkpoint exists and is resumable
    from mvip_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(str(tmp_path), "crash", "ckpt"))
    assert ckpt.latest_step() is not None and ckpt.latest_step() >= 9
    ckpt.close()


def test_emergency_checkpoint_on_sigterm(tmp_path, monkeypatch):
    """SIGTERM (batch scheduler / `timeout` / driver kill) must leave a
    resumable emergency checkpoint, same as an exception."""
    import signal

    from mvip_tpu.train import loop as L

    images = np.random.default_rng(0).uniform(0, 1, (2, 12, 16, 3)).astype(np.float32)
    masks = np.zeros((2, 12, 16), np.float32)
    masks[:, 4:8, 5:10] = 1
    depths = np.ones((2, 12, 16), np.float32) * 0.5
    poses = np.tile(np.eye(4)[:3], (2, 1, 1)).astype(np.float32)
    poses[:, 2, 3] = 4.0

    def fake_load_scene(cfg):
        from mvip_tpu.data.rays import build_ray_streams

        streams = build_ray_streams(images, masks, depths, poses, 10.0)
        return (streams, 2.0, 6.0, (12, 16, 10.0), poses, np.arange(2),
                np.array([0]), poses[:1], images[:1])

    monkeypatch.setattr(L, "load_scene", fake_load_scene)

    cfg = Config(
        expname="sigterm", basedir=str(tmp_path), N_rand=8, N_samples=4,
        N_importance=0, no_tcnn=True, netdepth=2, netwidth=16, multires=2,
        multires_views=2, depth_loss=False, N_iters=50, i_print=5, i_weights=100,
        i_video=0, i_testset=0, raw_noise_std=1.0, second_stage=False,
    )

    calls = {"n": 0}
    orig = L.make_train_step

    def signalling_make(*a, **kw):
        step = orig(*a, **kw)

        def wrapped(state, streams, key):
            calls["n"] += 1
            if calls["n"] > 10:
                os.kill(os.getpid(), signal.SIGTERM)
            return step(state, streams, key)

        return wrapped

    monkeypatch.setattr(L, "make_train_step", signalling_make)

    with pytest.raises(KeyboardInterrupt, match="signal"):
        L.train(cfg, log_fn=lambda *_: None)

    from mvip_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(str(tmp_path), "sigterm", "ckpt"))
    assert ckpt.latest_step() is not None and ckpt.latest_step() >= 9
    ckpt.close()
    # handler restored (default action) after train() unwound
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, signal.Handlers.SIG_DFL)


def test_data_parallel_matches_single_device():
    """The sharded step must produce identical losses on 1 vs 8 virtual devices
    (pure SPMD: sharding constraints change layout, not math)."""
    code = """
import jax, jax.numpy as jnp, numpy as np
from mvip_tpu.data.rays import build_ray_streams
from mvip_tpu.models.nerf_mlp import NeRFMLPConfig, apply_nerf_mlp, init_nerf_mlp
from mvip_tpu.parallel.mesh import make_mesh, replicate
from mvip_tpu.render.renderer import RenderOptions
from mvip_tpu.train.state import create_train_state, make_optimizer
from mvip_tpu.train.step import DeviceStreams, StepConfig, make_train_step

rng = np.random.default_rng(0)
images = rng.uniform(0, 1, (2, 12, 16, 3)).astype(np.float32)
masks = np.zeros((2, 12, 16), np.float32); masks[:, 4:8, 5:10] = 1
depths = rng.uniform(0.2, 0.8, (2, 12, 16)).astype(np.float32)
poses = np.tile(np.eye(4)[:3], (2, 1, 1)).astype(np.float32); poses[:, 2, 3] = 4.0
streams = build_ray_streams(images, masks, depths, poses, 10.0)

mc = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
ropts = RenderOptions(n_samples=8, n_importance=0, perturb=1.0, raw_noise_std=1.0,
                      use_pallas=False)
scfg = StepConfig(n_rand=16, depth_loss=True, near=2.0, far=6.0, H=12, W=16,
                  focal=10.0)
opt = make_optimizer(5e-3, 250)

losses = []
for n_dev in (1, 8):
    params = {"coarse": init_nerf_mlp(jax.random.PRNGKey(1), mc), "fine": None}
    state = create_train_state(params, opt)
    mesh = make_mesh(n_dev)
    with mesh:
        ds = replicate(DeviceStreams.from_host(streams), mesh)
        state = replicate(state, mesh)
        step = make_train_step(scfg, ropts, lambda p, x, v: apply_nerf_mlp(p, mc, x, v), None, opt)
        for i in range(3):
            state, m = step(state, ds, jax.random.fold_in(jax.random.PRNGKey(0), i))
        losses.append(float(m["loss"]))
print("LOSSES", losses)
assert abs(losses[0] - losses[1]) < 1e-5, losses
print("MATCH")
"""
    r = run_in_cpu_mesh(code)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MATCH" in r.stdout
