"""Render-tree directory contract (`DS_NeRF/run.py:1286-1350` savedir dumps).

The reference's `render_path(savedir=...)` writes per-frame
`rgb/{i:06d}.png`, `depth|disp|weight|z|alpha/{i:06d}.npy`,
`pose/{i:06d}.txt` (4x4) and GT `images/{i:06d}.png`. All three of our
render paths (XLA chunked, fused MLP megakernel, fused hash megakernel)
must produce it.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.models.nerf_mlp import NeRFMLPConfig, apply_nerf_mlp, init_nerf_mlp
from mvip_tpu.ops.compositing import alpha_from_weights, composite
from mvip_tpu.render.renderer import RenderOptions


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_alpha_from_weights_roundtrips_composite(key):
    raw = jax.random.normal(key, (6, 12, 4))
    z = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 1), (6, 12),
                                    minval=2.0, maxval=6.0), -1)
    rd = jax.random.normal(jax.random.fold_in(key, 2), (6, 3))
    out = composite(raw, z, rd)
    got = alpha_from_weights(out.weights)
    np.testing.assert_allclose(np.asarray(got), np.asarray(out.alpha),
                               atol=1e-5, rtol=1e-4)


def _tree_files(savedir, n_frames, with_gt):
    subs = ["rgb", "depth", "disp", "weight", "z", "alpha", "pose"]
    if with_gt:
        subs.append("images")
    for i in range(n_frames):
        for sub in subs:
            if sub in ("rgb", "images"):
                path = os.path.join(savedir, sub, f"{i:06d}.png")
            elif sub == "pose":
                path = os.path.join(savedir, sub, f"{i:06d}.txt")
            else:
                path = os.path.join(savedir, sub, f"{i:06d}.npy")
            assert os.path.exists(path), path


def test_render_pose_list_writes_reference_tree(tmp_path, key):
    from mvip_tpu.eval.render_path import render_pose_list

    cfg = NeRFMLPConfig(depth=2, width=32, skips=(), multires=4, multires_views=2)
    params = init_nerf_mlp(key, cfg)
    model = lambda pts, vd: apply_nerf_mlp(params, cfg, pts, vd)
    poses = np.stack([np.eye(4)[:3, :4]] * 2).astype(np.float32)
    poses[:, 2, 3] = 4.0
    H, W = 6, 8
    gt = np.random.default_rng(0).uniform(size=(2, H, W, 3)).astype(np.float32)
    opts = RenderOptions(n_samples=8, n_importance=8, perturb=0.0,
                         raw_noise_std=0.0)
    savedir = str(tmp_path / "testset")
    outs = render_pose_list(poses, H, W, 10.0, 2.0, 6.0, model, None, opts,
                            savedir=savedir, dump_raw=True, gt_imgs=gt,
                            key=jax.random.PRNGKey(0))
    assert outs["rgb"].shape == (2, H, W, 3)
    _tree_files(savedir, 2, with_gt=True)
    w = np.load(os.path.join(savedir, "weight", "000000.npy"))
    z = np.load(os.path.join(savedir, "z", "000000.npy"))
    a = np.load(os.path.join(savedir, "alpha", "000000.npy"))
    assert w.shape == (H, W, 16) and z.shape == (H, W, 16) and a.shape == w.shape
    assert (np.diff(z, axis=-1) >= 0).all()          # merged sorted ladder
    pose4 = np.loadtxt(os.path.join(savedir, "pose", "000000.txt"))
    assert pose4.shape == (4, 4) and pose4[3, 3] == 1.0


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_fused_image_renders_return_extras(key):
    """Both fused eval paths expose weights/z_vals/alpha (interpret mode)."""
    from mvip_tpu.models.nerf_hashgrid import HashGridConfig, init_hashgrid_nerf
    from mvip_tpu.ops.pallas_hash_render import hash_render_image
    from mvip_tpu.ops.pallas_render import fused_render_image

    H, W, S = 4, 8, 6
    cfg = NeRFMLPConfig(depth=2, width=32, skips=(), multires=4, multires_views=2)
    params = init_nerf_mlp(key, cfg)
    c2w = jnp.eye(4)[:3, :4].at[2, 3].set(4.0)
    # fused_render_image has no interpret kwarg (TPU-only); exercise the
    # hash path in interpret mode and the MLP path only on TPU
    if jax.devices()[0].platform == "tpu":
        out = fused_render_image(params, params, cfg, H, W, 10.0, c2w, 2.0,
                                 6.0, S, S, extras=True)
        assert out["weights"].shape == (H, W, 2 * S + 1)
        assert out["z_vals"].shape == (H, W, 2 * S + 1)

    hcfg = HashGridConfig(n_levels=4, log2_table_size=10, base_resolution=4,
                          finest_resolution=64.0, bound=4.0, sigma_hidden=32,
                          color_hidden=32, fused=False, fused_block=256)
    hp = init_hashgrid_nerf(jax.random.fold_in(key, 1), hcfg)
    out = hash_render_image(hp, hp, hcfg, H, W, 10.0, c2w, 2.0, 6.0, S, S,
                            interpret=True, extras=True)
    n_all = 2 * S  # hash hier render merges S coarse + S fine (no +1 slot)
    assert out["weights"].shape == (H, W, n_all)
    assert out["z_vals"].shape == (H, W, n_all)
    assert out["alpha"].shape == (H, W, n_all)
    assert np.isfinite(np.asarray(out["alpha"])).all()
