"""COLMAP sparse-depth supervision.

Capability parity with `load_colmap_depth` (`DS_NeRF/load_llff.py:444-495`):
per-train-view keypoint depths in camera z, reprojection-error weights
`w = 2·exp(-(err/mean_err)^2)`, near/far bounds filter, pixel coords divided by the
image-pyramid factor, result cached to `colmap_depth.npy`.

Reference quirk generalized: the hardcoded `+40` image-index offset
(`load_llff.py:468-475`) pairs COLMAP images [41..100] with the SPIn-NeRF pose slice
`[40:]`; here the offset is `len(images) - n_views` (identical for the shipped
scene, correct for any other view split).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from mvip_tpu.data.colmap import qvec2rotmat, read_images_binary, read_points3d_binary


def colmap_c2w(images: Dict) -> np.ndarray:
    """c2w matrices for COLMAP images ordered by image id (`load_llff.py:432-441`)."""
    poses = []
    for iid in sorted(images):
        im = images[iid]
        R = qvec2rotmat(im.qvec)
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = im.tvec
        poses.append(np.linalg.inv(w2c))
    return np.stack(poses)


def load_colmap_depth(
    basedir: str,
    factor: int = 8,
    bds_raw: Optional[np.ndarray] = None,
    bd_factor: float = 0.75,
    n_views: Optional[int] = None,
    cache: bool = True,
    quirk_misaligned_pose: bool = False,
) -> List[dict]:
    """Returns a list (one dict per train view) of
    {"depth": [K], "coord": [K, 2] (x, y in factor-downsampled px), "weight": [K]}.

    `bds_raw` [N, 2]: raw (unscaled) near/far bounds from poses_bounds.npy; if None
    they are read from the scene's poses_bounds.npy directly.
    `n_views`: number of train views (default: all COLMAP images).

    `quirk_misaligned_pose`: reproduce a reference bug (`load_llff.py:477-481`) —
    it computes the keypoint depth of image k+offset in the camera of image *k*
    (and filters with bounds of view k). Default False = correct alignment.
    """
    cache_file = os.path.join(basedir, "colmap_depth.npy")
    if cache and os.path.exists(cache_file):
        return list(np.load(cache_file, allow_pickle=True))

    images = read_images_binary(os.path.join(basedir, "sparse", "0", "images.bin"))
    points = read_points3d_binary(os.path.join(basedir, "sparse", "0", "points3D.bin"))

    errs = np.array([p.error for p in points.values()])
    err_mean = errs.mean()

    poses = colmap_c2w(images)

    if bds_raw is None:
        arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
        bds_raw = arr[:, -2:].astype(np.float32)
    sc = 1.0 if bd_factor is None else 1.0 / (bds_raw.min() * bd_factor)

    ids = sorted(images)
    n_total = len(ids)
    n_views = n_views or n_total
    offset = n_total - n_views  # reference: hardcoded 40 (load_llff.py:468)

    xyz = {pid: p.xyz for pid, p in points.items()}
    werr = {pid: 2.0 * np.exp(-((p.error / err_mean) ** 2)) for pid, p in points.items()}

    data_list = []
    for k in range(n_views):
        im = images[ids[k + offset]]
        pose_idx = k if quirk_misaligned_pose else k + offset
        bds_idx = k if quirk_misaligned_pose else min(k + offset, len(bds_raw) - 1)
        pose = poses[pose_idx]
        empty = {
            "depth": np.zeros((0,), np.float32),
            "coord": np.zeros((0, 2), np.float32),
            "weight": np.zeros((0,), np.float32),
        }
        valid = im.point3D_ids != -1
        if not valid.any():
            # keep an EMPTY record so data_list stays index-aligned with views
            data_list.append(empty)
            continue
        pids = im.point3D_ids[valid]
        pts = np.stack([xyz[pid] for pid in pids])                      # [K, 3]
        depth = (pts - pose[:3, 3]) @ pose[:3, 2] * sc                  # camera z
        lo, hi = bds_raw[bds_idx, 0] * sc, bds_raw[bds_idx, 1] * sc
        keep = (depth >= lo) & (depth <= hi)
        if not keep.any():
            data_list.append(empty)
            continue
        data_list.append(
            {
                "depth": depth[keep].astype(np.float32),
                "coord": (im.xys[valid][keep] / factor).astype(np.float32),
                "weight": np.array([werr[pid] for pid in pids[keep]], np.float32),
            }
        )
    if cache:
        try:
            np.save(cache_file, np.array(data_list, dtype=object), allow_pickle=True)
        except OSError:
            pass  # read-only scene mounts
    return data_list


def load_sensor_depth(
    basedir: str,
    factor: int = 8,
    bds_raw: Optional[np.ndarray] = None,
    bd_factor: float = 0.75,
    cache: bool = True,
):
    """Sensor-depth variant (`DS_NeRF/load_llff.py:498-555`): identical keypoint
    depth/weight extraction over ALL views (no pose-slice offset), plus the
    `depth/` image stack from disk. NOTE the reference loads that stack and
    never uses it (`:521-525`) — returned here so callers can actually supervise
    with it. Returns (data_list, sensor_depths | None)."""
    data_list = load_colmap_depth(
        basedir, factor=factor, bds_raw=bds_raw, bd_factor=bd_factor,
        n_views=None, cache=cache,
    )
    depth_dir = os.path.join(basedir, "depth")
    sensor = None
    if os.path.isdir(depth_dir):
        import imageio.v2 as imageio

        files = sorted(
            f for f in os.listdir(depth_dir)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )
        if files:
            sensor = np.stack(
                [np.asarray(imageio.imread(os.path.join(depth_dir, f))) for f in files]
            )
    return data_list, sensor
