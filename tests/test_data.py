"""Data-layer tests: COLMAP I/O round-trips and LLFF scene ingestion on the
reference-mounted SPIn-NeRF scene 1."""

import numpy as np
import pytest

from tests.conftest import REFERENCE_SCENE, requires_scene

from mvip_tpu.data.colmap import (
    Camera,
    Image,
    Point3D,
    qvec2rotmat,
    read_cameras_binary,
    read_model,
    rotmat2qvec,
    write_model,
)
from mvip_tpu.data.llff import load_llff_scene, recenter_poses, poses_avg
from mvip_tpu.data.rays import build_ray_streams


def _toy_model():
    cams = {1: Camera(1, "PINHOLE", 640, 480, np.array([500.0, 500.0, 320.0, 240.0]))}
    rng = np.random.default_rng(0)
    imgs = {}
    for i in (1, 2):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        imgs[i] = Image(
            i, q, rng.standard_normal(3), 1, f"img_{i}.png",
            rng.uniform(0, 640, (5, 2)), np.array([3, -1, 4, -1, 5], np.int64),
        )
    pts = {
        pid: Point3D(
            pid, rng.standard_normal(3), (rng.uniform(0, 255, 3)).astype(np.uint8),
            float(rng.uniform(0.1, 2.0)), np.array([1, 2], np.int32),
            np.array([0, 1], np.int32),
        )
        for pid in (3, 4, 5)
    }
    return cams, imgs, pts


@pytest.mark.parametrize("ext", [".bin", ".txt"])
def test_colmap_model_roundtrip(tmp_path, ext):
    cams, imgs, pts = _toy_model()
    write_model(cams, imgs, pts, str(tmp_path), ext)
    cams2, imgs2, pts2 = read_model(str(tmp_path), ext)
    assert cams2[1].model == "PINHOLE" and cams2[1].width == 640
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    for i in (1, 2):
        np.testing.assert_allclose(imgs2[i].qvec, imgs[i].qvec, atol=1e-12)
        np.testing.assert_allclose(imgs2[i].tvec, imgs[i].tvec, atol=1e-12)
        np.testing.assert_allclose(imgs2[i].xys, imgs[i].xys, atol=1e-12)
        np.testing.assert_array_equal(imgs2[i].point3D_ids, imgs[i].point3D_ids)
        assert imgs2[i].name == imgs[i].name
    for p in (3, 4, 5):
        np.testing.assert_allclose(pts2[p].xyz, pts[p].xyz, atol=1e-12)
        np.testing.assert_array_equal(pts2[p].rgb, pts[p].rgb)
        np.testing.assert_array_equal(pts2[p].image_ids, pts[p].image_ids)


def test_qvec_rotmat_roundtrip(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-10)


@requires_scene
def test_reference_cameras_bin_parses():
    cams = read_cameras_binary(REFERENCE_SCENE + "/sparse/0/cameras.bin")
    assert len(cams) >= 1
    cam = next(iter(cams.values()))
    assert cam.width > 0 and cam.height > 0 and len(cam.params) >= 3


def test_recenter_poses_average_is_identity(rng):
    poses = np.zeros((5, 3, 5), np.float32)
    for i in range(5):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        poses[i, :3, :3] = qvec2rotmat(q)
        poses[i, :3, 3] = rng.standard_normal(3)
        poses[i, :3, 4] = [100, 200, 50.0]
    rec = recenter_poses(poses)
    avg = poses_avg(rec)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-5)


@requires_scene
def test_load_llff_scene_1():
    scene = load_llff_scene(REFERENCE_SCENE, factor=4)
    n, h, w = scene.images.shape[:3]
    assert (n, h, w) == (60, 567, 1008)
    assert scene.poses.shape == (60, 3, 4)
    assert scene.masks.shape == (60, 567, 1008)
    assert scene.inpainted_depths.shape == (60, 567, 1008)
    assert scene.render_poses.shape == (120, 3, 5)
    assert set(np.unique(scene.masks)) <= {0.0, 1.0}
    assert 0.0 <= scene.images.min() and scene.images.max() <= 1.0
    assert 0 < scene.near < scene.far
    # focal consistent with poses_bounds (raw focal / factor)
    raw = np.load(REFERENCE_SCENE + "/poses_bounds.npy")
    focal_raw = raw[0, :-2].reshape(3, 5)[2, 4]
    np.testing.assert_allclose(scene.focal, focal_raw / 4, rtol=1e-6)


@requires_scene
def test_build_ray_streams_scene_1():
    scene = load_llff_scene(REFERENCE_SCENE, factor=4)
    streams = build_ray_streams(
        scene.images, scene.masks, scene.inpainted_depths, scene.poses, scene.focal
    )
    n, h, w = scene.images.shape[:3]
    n_masked = int((scene.masks == 1).sum())
    n_unmasked = int((scene.masks == 0).sum())
    assert streams.clf_idx.shape == (n_unmasked,)
    assert int(streams.masked_counts.sum()) == n_masked
    assert streams.masked_coords.shape[0] == n
    assert streams.masked_coords.shape[1] == int(streams.masked_counts.max())
    # every masked coord indexes a masked pixel
    v = int(np.argmax(streams.masked_counts))
    k = int(streams.masked_counts[v])
    cc, rr = streams.masked_coords[v, :k, 0], streams.masked_coords[v, :k, 1]
    assert (scene.masks[v, rr, cc] == 1).all()
    # clf indices decode to unmasked pixels
    sample = streams.clf_idx[:: max(1, len(streams.clf_idx) // 997)]
    vv, rem = np.divmod(sample.astype(np.int64), h * w)
    rr2, cc2 = np.divmod(rem, w)
    assert (scene.masks[vv, rr2, cc2] == 0).all()


def test_reference_config_file_parses():
    """The reference's shipped config_1.txt parses through our config system
    with its key semantics intact (`DS_NeRF/config/config_1.txt`)."""
    import os

    path = "/root/reference/DS_NeRF/config/config_1.txt"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference config not mounted")
    from mvip_tpu.config import parse_config_file

    vals = parse_config_file(path)
    assert vals["N_rand"] == 1024 and vals["N_samples"] == 64
    assert vals["N_importance"] == 64 and vals["lrate"] == 0.003
    assert vals["is_rgb_guidance"] is True and vals["is_colla_guidance"] is False
    assert vals["second_stage"] is True and vals["lindisp"] is True


def test_shipped_scene1_configs_default_tpu_first():
    """The canonical scene-1 configs ship the TPU-first accelerators ON
    (interval occupancy + megastep — quality-neutral, BASELINE.md), and the
    `--no_<flag>` CLI negation restores reference-exact semantics."""
    import os

    from mvip_tpu.config import load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in ("spinnerf_scene1_plain", "spinnerf_scene1",
                 "spinnerf_scene1_full", "spinnerf_scene1_rgb_sds"):
        path = os.path.join(root, name + ".txt")
        cfg = load_config(["--config", path])
        assert cfg.occ_grid is True, name
        assert cfg.occ_mode == "interval" and cfg.megastep > 1, name
        # the reference-exact escape hatch
        off = load_config(["--config", path, "--no_occ_grid", "--megastep", "1"])
        assert off.occ_grid is False and off.megastep == 1, name
    # an explicit positive flag beats the negation
    both = load_config(["--no_occ_grid", "--occ_grid"])
    assert both.occ_grid is True


def test_images_text_roundtrip_with_zero_point_image(tmp_path):
    """An image with NO keypoints writes a blank points line; the parser must
    keep header/points pairing (regression: blank lines were filtered out)."""
    import numpy as np

    from mvip_tpu.data.colmap import Image, read_images_text, write_images_text

    images = {
        1: Image(1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "empty.png",
                 np.zeros((0, 2)), np.zeros((0,), np.int64)),
        2: Image(2, np.array([1.0, 0, 0, 0]), np.ones(3), 1, "full.png",
                 np.array([[1.0, 2.0]]), np.array([7], np.int64)),
    }
    path = str(tmp_path / "images.txt")
    write_images_text(images, path)
    back = read_images_text(path)
    assert back[1].name == "empty.png" and len(back[1].point3D_ids) == 0
    assert back[2].name == "full.png" and back[2].point3D_ids[0] == 7
