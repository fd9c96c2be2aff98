"""Tests for the tools long tail: activations, NeRF_RGB, correspondence,
probes, pose pipeline, live controls, metrics, report/eval CLIs."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.ops.activation import trunc_exp


def test_trunc_exp_value_and_clamped_grad():
    x = jnp.array([0.0, 1.0, 20.0, -20.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp(np.asarray(x)),
                               rtol=1e-6)
    g = jax.vmap(jax.grad(trunc_exp))(x)
    # backward clamps input to [-15, 15] (`DS_NeRF/activation.py:14-17`)
    expect = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5)


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_nerf_rgb_frozen_sigma(key):
    from mvip_tpu.models.nerf_mlp import NeRFMLPConfig, apply_nerf_mlp, init_nerf_mlp
    from mvip_tpu.models.nerf_rgb import apply_nerf_rgb, init_nerf_rgb

    cfg = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
    alpha_params = init_nerf_mlp(key, cfg)
    alpha_fn = lambda pts, vd: apply_nerf_mlp(alpha_params, cfg, pts, vd)
    params = init_nerf_rgb(jax.random.fold_in(key, 1), cfg)

    pts = jax.random.normal(key, (5, 3))
    vd = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    raw = apply_nerf_rgb(params, cfg, alpha_fn, pts, vd)
    # sigma channel equals the frozen model's
    np.testing.assert_allclose(
        np.asarray(raw[..., 3]), np.asarray(alpha_fn(pts, vd)[..., 3]), rtol=1e-6
    )
    # and carries no gradient to the color params through sigma
    g = jax.grad(lambda p: jnp.sum(apply_nerf_rgb(p, cfg, alpha_fn, pts, vd)[..., 3]))(
        params
    )
    assert all(
        float(jnp.abs(l).max()) == 0 for l in jax.tree_util.tree_leaves(g)
    )


def test_reprojection_identity_and_match(key):
    from mvip_tpu.ops.correspondence import correspondence, reproject

    H, W, focal = 32, 40, 30.0
    c2w = jnp.eye(4)[:3]
    coords = jnp.array([[20.0, 16.0], [5.0, 7.0]])
    depth = jnp.array([2.0, 3.0])
    uv, z = reproject(coords, depth, c2w, c2w, H, W, focal)
    np.testing.assert_allclose(np.asarray(uv), np.asarray(coords), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), atol=1e-5)

    depth_map = jnp.full((H, W), 2.0)
    uv2, ok = correspondence(coords[:1], depth[:1], depth_map, c2w, c2w, H, W, focal)
    assert bool(ok[0])


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_sample_sigma_probe(key, tmp_path):
    from mvip_tpu.eval.probes import render_test_ray
    from mvip_tpu.models.nerf_mlp import NeRFMLPConfig, apply_nerf_mlp, init_nerf_mlp

    cfg = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
    params = init_nerf_mlp(key, cfg)
    fn = lambda pts, vd: apply_nerf_mlp(params, cfg, pts, vd)
    ro = jnp.zeros((3, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (3, 1))
    out = render_test_ray(None, ro, rd, 2.0, 6.0, fn, 16, savedir=str(tmp_path))
    assert out["sigma"].shape == (3, 16) and np.isfinite(out["sigma"]).all()
    assert os.path.exists(tmp_path / "sigma_ray0.png")


def test_pose_pipeline_roundtrip(tmp_path):
    """Synthetic COLMAP model -> poses_bounds.npy with the LLFF axis fix."""
    from mvip_tpu.data.colmap import Camera, Image, Point3D, write_model
    from mvip_tpu.data.pose_pipeline import load_colmap_model, save_poses_bounds

    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse)
    cams = {1: Camera(id=1, model="SIMPLE_RADIAL", width=64, height=48,
                      params=np.array([50.0, 32.0, 24.0, 0.0]))}
    # two cameras: identity and translated along x (w2c with q=[1,0,0,0])
    images = {
        1: Image(id=1, qvec=np.array([1.0, 0, 0, 0]), tvec=np.array([0.0, 0, 0]),
                 camera_id=1, name="a.png", xys=np.zeros((1, 2)),
                 point3D_ids=np.array([1])),
        2: Image(id=2, qvec=np.array([1.0, 0, 0, 0]), tvec=np.array([-1.0, 0, 0]),
                 camera_id=1, name="b.png", xys=np.zeros((1, 2)),
                 point3D_ids=np.array([1])),
    }
    pts = {
        i: Point3D(id=i, xyz=np.array([0.1 * i, 0.0, 4.0 + i]),
                   rgb=np.array([255, 0, 0]), error=0.5,
                   image_ids=np.array([1, 2]), point2D_idxs=np.array([0, 0]))
        for i in range(1, 12)
    }
    write_model(cams, images, pts, str(sparse), ".bin")

    poses, pts3d, perm = load_colmap_model(str(tmp_path))
    assert poses.shape == (3, 5, 2)
    # hwf column
    np.testing.assert_allclose(poses[:, 4, 0], [48, 64, 50])
    # identity w2c -> c2w rotation columns permuted to [-u, r, -t] = rows swap
    R = poses[:3, :3, 0]
    np.testing.assert_allclose(R[:, 0], [0, 1, 0], atol=1e-8)   # -u col = +y
    np.testing.assert_allclose(R[:, 2], [0, 0, -1], atol=1e-8)  # -t col

    arr = save_poses_bounds(str(tmp_path), poses, pts3d, perm)
    assert arr.shape == (2, 17)
    assert os.path.exists(tmp_path / "poses_bounds.npy")
    close, inf = arr[0, 15], arr[0, 16]
    assert 0 < close < inf  # point depths are positive along -t


def test_live_control_file_watcher(tmp_path):
    from mvip_tpu.utils.live_control import FileWatcher, LiveControls

    c = LiveControls()
    path = str(tmp_path / "control.json")
    w = FileWatcher(c, path)
    assert os.path.exists(path)  # seeded
    data = json.load(open(path))
    data["render_factor"] = 4
    data["white_bkgd"] = True
    os.utime  # noqa
    import time

    time.sleep(0.01)
    json.dump(data, open(path, "w"))
    os.utime(path, (time.time() + 2, time.time() + 2))
    assert w.check()
    assert c.render_factor == 4 and c.white_bkgd is True


def test_frechet_distance():
    from mvip_tpu.eval.metrics import frechet_distance

    mu = np.zeros(4)
    s = np.eye(4)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-4
    d = frechet_distance(mu, s, mu + 1.0, s)
    np.testing.assert_allclose(d, 4.0, atol=1e-3)  # ||1||^2 over 4 dims


def test_inception_init_preserves_activation_scale():
    """Regression for the r5 weights-day finding: `_bconv_init`'s former
    0.1/sqrt(fan_in) gain collapsed activations to ~1e-20 over InceptionV3's
    depth, so the SYNTHESIZED dry-tree extractor mapped every image to the
    same constant feature vector and FID measured 0.0 between any two image
    sets. Pin the variance-preserving property on a 20-deep conv+BN+relu
    stack built from the same primitive (cheap — the full net init alone
    costs >1 min on this host)."""
    import jax
    import jax.numpy as jnp

    from mvip_tpu.eval.inception_jax import _bconv, _bconv_init

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 99), (1, 16, 16, 32))
    for i in range(20):
        p = _bconv_init(jax.random.fold_in(key, i), 3, 3, 32, 32)
        x = _bconv(p, x, stride=1, pad=(1, 1))
    s = float(jnp.std(x))
    # relu halves the variance each layer relative to a linear stack; He
    # init compensates. 20 layers of the old 0.1 gain land at ~1e-20.
    assert 0.05 < s < 20.0, f"activation std collapsed/exploded: {s}"


def test_generate_html_cli(tmp_path):
    import imageio.v2 as imageio

    expdir = tmp_path / "exp1" / "rgb"
    os.makedirs(expdir)
    imageio.imwrite(str(expdir / "000.png"), np.zeros((8, 8, 3), np.uint8))
    out = tmp_path / "report.html"
    r = subprocess.run(
        [sys.executable, "tools/generate_html.py", "--logdir", str(tmp_path),
         "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    html = open(out).read()
    assert "<img" in html and "exp1" in html


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_evaluate_cli(tmp_path):
    import imageio.v2 as imageio

    pred, gt = tmp_path / "pred", tmp_path / "gt"
    os.makedirs(pred)
    os.makedirs(gt)
    rng = np.random.default_rng(0)
    for i in range(2):
        img = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
        imageio.imwrite(str(pred / f"{i}.png"), img)
        imageio.imwrite(str(gt / f"{i}.png"), img)
    r = subprocess.run(
        [sys.executable, "tools/evaluate.py", "--pred", str(pred), "--gt", str(gt),
         "--out", str(tmp_path / "eval.txt")],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    assert "PSNR" in r.stdout
    # identical images -> PSNR should be huge (capped by float)
    psnr_line = [l for l in r.stdout.splitlines() if l.startswith("PSNR")][0]
    assert float(psnr_line.split()[1]) > 50


def test_ssim_range_and_identity(rng):
    """SSIM(x, x) == 1; SSIM of unrelated noise stays in [-1, 1] — regression
    for the bf16-conv variance blowup seen on real renders."""
    from mvip_tpu.eval.metrics import ssim

    x = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    y = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    assert abs(float(ssim(x, x)) - 1.0) < 1e-4
    v = float(ssim(x, y))
    assert -1.0 <= v <= 1.0 and v < 0.2
    # smooth related images score high
    z = np.clip(x + 0.01 * rng.normal(size=x.shape).astype(np.float32), 0, 1)
    assert float(ssim(x, z)) > 0.9


def test_weights_day_fake_tokenizer(tmp_path):
    """weights_day dry writes a VALID minimal CLIP tokenizer (no vocab ships
    in this image): CLIPTokenizer loads it, ids stay below the 514-entry
    vocab (so they embed in any CLIP text encoder), padding reaches 77."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "weights_day", os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "weights_day.py")
    )
    wd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wd)
    tok_dir = tmp_path / "tokenizer"
    wd._write_fake_tokenizer(str(tok_dir))

    from mvip_tpu.guidance.clip import tokenize

    ids = tokenize(["a stone park bench", ""], str(tok_dir))
    assert ids.shape == (2, 77)
    assert ids.min() >= 0 and ids.max() < 514


def test_watchdog_restarts_stalled_trainer(tmp_path):
    """tools/watchdog.py detects a stalled child (writes progress once, then
    hangs — the futex-hang signature from logs_ours/README.md), SIGKILLs its
    process group, relaunches, and returns the second incarnation's clean
    exit code (VERDICT r4 next #7)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "watchdog", os.path.join(os.path.dirname(__file__), "..",
                                 "tools", "watchdog.py")
    )
    wd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wd)

    progress = tmp_path / "metrics.jsonl"
    attempts = tmp_path / "attempts"
    trainer = tmp_path / "fake_trainer.py"
    trainer.write_text(
        "import os, sys, time\n"
        f"att = {str(attempts)!r}; prog = {str(progress)!r}\n"
        "n = int(open(att).read()) if os.path.exists(att) else 0\n"
        "open(att, 'w').write(str(n + 1))\n"
        "with open(prog, 'a') as f: f.write('{\"step\": 1}\\n')\n"
        "if n == 0:\n"
        "    time.sleep(3600)  # incarnation 1: hang after first progress\n"
        "sys.exit(0)          # incarnation 2: resume + finish cleanly\n"
    )
    rc = wd.run_with_watchdog(
        [sys.executable, str(trainer)],
        progress_file=str(progress),
        stall_seconds=1.0,
        grace_seconds=10.0,
        cooldown_seconds=0.1,
        max_restarts=2,
        poll_seconds=0.2,
        log=lambda *a: None,
    )
    assert rc == 0
    assert attempts.read_text() == "2"
    # budget exhaustion path: a trainer that always hangs returns 17
    always = tmp_path / "always_hang.py"
    prog2 = tmp_path / "p2.jsonl"
    always.write_text(
        f"import time\nopen({str(prog2)!r}, 'a').write('x')\ntime.sleep(3600)\n"
    )
    rc2 = wd.run_with_watchdog(
        [sys.executable, str(always)],
        progress_file=str(prog2),
        stall_seconds=0.5,
        grace_seconds=5.0,
        cooldown_seconds=0.05,
        max_restarts=1,
        poll_seconds=0.1,
        log=lambda *a: None,
    )
    assert rc2 == wd.EXIT_BUDGET_EXHAUSTED
    # crash path: a nonzero exit is relaunched (auto-resume protocol) and the
    # second incarnation's clean exit is returned
    att3 = tmp_path / "attempts3"
    crashy = tmp_path / "crashy.py"
    crashy.write_text(
        "import os, sys\n"
        f"att = {str(att3)!r}\n"
        "n = int(open(att).read()) if os.path.exists(att) else 0\n"
        "open(att, 'w').write(str(n + 1))\n"
        "sys.exit(3 if n == 0 else 0)\n"
    )
    rc3 = wd.run_with_watchdog(
        [sys.executable, str(crashy)],
        progress_file=str(tmp_path / "p3.jsonl"),
        stall_seconds=5.0,
        grace_seconds=10.0,
        cooldown_seconds=0.05,
        max_restarts=2,
        poll_seconds=0.1,
        log=lambda *a: None,
    )
    assert rc3 == 0 and att3.read_text() == "2"
