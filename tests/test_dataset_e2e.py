"""End-to-end training smoke on synthetic Blender and DTU fixtures.

Proves the dataset dispatch paths of BASELINE.json configs 2 (blender) and 3
(dtu) run train() -> checkpoint with nothing but generated files on disk.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full fits/e2e: excluded from the fast `-m "not slow"` gate


def _write_blender_fixture(root, n=3, H=16, W=16):
    import imageio.v2 as imageio

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        frames = []
        sdir = os.path.join(root, split)
        os.makedirs(sdir, exist_ok=True)
        for i in range(n):
            th = 0.5 * i
            c, s = np.cos(th), np.sin(th)
            pose = np.eye(4)
            pose[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
            pose[:3, 3] = [4 * s, 0, 4 * c]
            name = f"./{split}/r_{i}"
            rgba = (rng.uniform(0, 255, (H, W, 4))).astype(np.uint8)
            imageio.imwrite(os.path.join(sdir, f"r_{i}.png"), rgba)
            frames.append({"file_path": name, "transform_matrix": pose.tolist()})
        meta = {"camera_angle_x": 0.8, "frames": frames}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as fh:
            json.dump(meta, fh)


def _write_dtu_fixture(root, n=3, H=16, W=20):
    import imageio.v2 as imageio

    imgdir = os.path.join(root, "image")
    os.makedirs(imgdir, exist_ok=True)
    rng = np.random.default_rng(0)
    cams = {}
    K = np.array([[20.0, 0, W / 2, 0], [0, 20.0, H / 2, 0], [0, 0, 1, 0]])
    for i in range(n):
        imageio.imwrite(
            os.path.join(imgdir, f"{i:06d}.png"),
            rng.uniform(0, 255, (H, W, 3)).astype(np.uint8),
        )
        th = 0.4 * i
        c, s = np.cos(th), np.sin(th)
        w2c = np.eye(4)
        w2c[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]).T
        w2c[:3, 3] = -w2c[:3, :3] @ np.array([4 * s, 0, 4 * c])
        cams[f"world_mat_{i}"] = K @ w2c
        cams[f"scale_mat_{i}"] = np.eye(4)
    np.savez(os.path.join(root, "cameras.npz"), **cams)


@pytest.mark.parametrize("dataset", ["blender", "dtu"])
def test_train_on_synthetic_dataset(tmp_path, dataset):
    from mvip_tpu.config import Config
    from mvip_tpu.train.loop import train

    data = tmp_path / "data"
    if dataset == "blender":
        _write_blender_fixture(str(data))
    else:
        _write_dtu_fixture(str(data))

    cfg = Config(
        expname=f"{dataset}_e2e", basedir=str(tmp_path / "logs"),
        datadir=str(data), dataset_type=dataset,
        N_rand=16, N_samples=4, N_importance=4, N_iters=3, i_print=1,
        i_weights=100, i_video=0, i_testset=0,
        no_tcnn=True, netdepth=2, netwidth=16, multires=2, multires_views=2,
        depth_loss=False, raw_noise_std=1.0, white_bkgd=(dataset == "blender"),
        second_stage=False, testskip=1,
    )
    logs = []
    train(cfg, log_fn=logs.append)
    assert any("step 3" in l for l in logs), logs[-3:]
    ckpt_dir = tmp_path / "logs" / f"{dataset}_e2e" / "ckpt"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())


def _write_nerd_fixture(root, n=3, H=16, W=20):
    import imageio.v2 as imageio

    imgdir = os.path.join(root, "images")
    mskdir = os.path.join(imgdir, "masks")
    os.makedirs(mskdir, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        name = f"{i:03d}.png"
        imageio.imwrite(os.path.join(imgdir, name),
                        rng.uniform(0, 255, (H, W, 3)).astype(np.uint8))
        m = np.zeros((H, W), np.uint8)
        m[4:10, 6:12] = 255
        imageio.imwrite(os.path.join(mskdir, name), m)
        th = 0.4 * i
        c, s = np.cos(th), np.sin(th)
        # LLFF pose row: [3x5 (rot | t | hwf)] + [close, inf]
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        pose = np.concatenate(
            [rot, np.array([[4 * s], [0], [4 * c]]), np.array([[H], [W], [18.0]])], 1
        )
        rows.append(np.concatenate([pose.ravel(), [2.0, 6.0]]))
    np.save(os.path.join(root, "poses_bounds.npy"), np.asarray(rows))


def test_train_on_synthetic_nerd(tmp_path):
    from mvip_tpu.config import Config
    from mvip_tpu.train.loop import train

    data = tmp_path / "data"
    _write_nerd_fixture(str(data))
    cfg = Config(
        expname="nerd_e2e", basedir=str(tmp_path / "logs"),
        datadir=str(data), dataset_type="nerd", factor=1, no_ndc=True,
        N_rand=16, N_samples=4, N_importance=0, N_iters=3, i_print=1,
        i_weights=100, i_video=0, i_testset=0,
        no_tcnn=True, netdepth=2, netwidth=16, multires=2, multires_views=2,
        depth_loss=False, raw_noise_std=1.0, second_stage=False,
    )
    logs = []
    train(cfg, log_fn=logs.append)
    assert any("step 3" in l for l in logs), logs[-3:]


def test_train_megastep_strides(tmp_path):
    """--megastep N: the loop strides by N, checkpoints and prints still fire
    (cadence checks use i % k < stride), and state.step reaches N_iters."""
    from mvip_tpu.config import Config
    from mvip_tpu.train.loop import train

    data = tmp_path / "data"
    _write_blender_fixture(str(data))
    cfg = Config(
        expname="mega_e2e", basedir=str(tmp_path / "logs"),
        datadir=str(data), dataset_type="blender",
        N_rand=16, N_samples=4, N_importance=4, N_iters=9, i_print=4,
        i_weights=6, i_video=0, i_testset=0, megastep=3,
        no_tcnn=True, netdepth=2, netwidth=16, multires=2, multires_views=2,
        depth_loss=False, raw_noise_std=1.0, white_bkgd=True,
        second_stage=False, testskip=1,
    )
    logs = []
    state = train(cfg, log_fn=logs.append)
    # budget rounds UP to whole dispatches: N_iters=9 -> 10 -> 12 steps
    assert int(state.step) == 12
    # prints label the LAST inner step of the dispatch (i=6 -> step 8)
    assert any("step 8" in l for l in logs), logs
    ckpt_dir = tmp_path / "logs" / "mega_e2e" / "ckpt"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())
