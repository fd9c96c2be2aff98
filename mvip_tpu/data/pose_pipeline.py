"""Offline pose pipeline: COLMAP SfM -> poses_bounds.npy.

Capability parity with `DS_NeRF/llff/poses/pose_utils.py:259-284` (`gen_poses`),
`:11-90` (`load_colmap_data`/`save_poses`) and the COLMAP subprocess wrapper
(`DS_NeRF/llff/poses/colmap_wrapper.py:23-77`). The COLMAP binary stays an
external host-side tool (it's an offline prep step, exactly as in the
reference); this module converts its sparse model to the LLFF pose format the
loaders consume:

  per image row: [3x5 pose matrix (c2w with axes [-u, r, -t] + hwf column),
                  close_depth, inf_depth]  -> poses_bounds.npy  [N, 17]
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np

from mvip_tpu.data.colmap import (
    qvec2rotmat,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
)


def run_colmap(basedir: str, match_type: str = "exhaustive_matcher",
               colmap_bin: Optional[str] = None) -> None:
    """Feature extraction -> matching -> mapping via the COLMAP binary
    (subprocess, log to colmap_output.txt — `colmap_wrapper.py:23-77`)."""
    colmap = colmap_bin or shutil.which("colmap")
    if not colmap:
        raise FileNotFoundError(
            "COLMAP binary not found on PATH; install it or pass colmap_bin="
        )
    log_path = os.path.join(basedir, "colmap_output.txt")
    db = os.path.join(basedir, "database.db")
    images = os.path.join(basedir, "images")
    os.makedirs(os.path.join(basedir, "sparse"), exist_ok=True)

    stages = [
        [colmap, "feature_extractor", "--database_path", db,
         "--image_path", images, "--ImageReader.single_camera", "1"],
        [colmap, match_type, "--database_path", db],
        [colmap, "mapper", "--database_path", db, "--image_path", images,
         "--output_path", os.path.join(basedir, "sparse"),
         "--Mapper.num_threads", "16", "--Mapper.init_min_tri_angle", "4",
         "--Mapper.multiple_models", "0", "--Mapper.extract_colors", "0"],
    ]
    with open(log_path, "w") as log:
        for cmd in stages:
            out = subprocess.run(cmd, capture_output=True, text=True, check=True)
            log.write(out.stdout)


def load_colmap_model(realdir: str):
    """sparse/0/*.bin -> (poses [3,5,N] in LLFF axes, pts3d dict, name perm).

    Axis convention: COLMAP c2w columns [r, -u, t] are permuted to [-u, r, -t]
    (`pose_utils.py:32-50` — note the comment: NOT [r, u, -t]); hwf appended as
    the 5th column.
    """
    sparse = os.path.join(realdir, "sparse", "0")
    camdata = read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    cam = camdata[sorted(camdata.keys())[0]]
    hwf = np.array([cam.height, cam.width, cam.params[0]], np.float64).reshape(3, 1)

    imdata = read_images_binary(os.path.join(sparse, "images.bin"))
    names = [imdata[k].name for k in imdata]
    perm = np.argsort(names)

    bottom = np.array([[0, 0, 0, 1.0]])
    c2w_list = []
    for k in imdata:
        im = imdata[k]
        R = qvec2rotmat(im.qvec)
        t = np.asarray(im.tvec).reshape(3, 1)
        w2c = np.concatenate([np.concatenate([R, t], 1), bottom], 0)
        c2w_list.append(np.linalg.inv(w2c))
    c2w = np.stack(c2w_list, 0)            # [N, 4, 4]

    poses = c2w[:, :3, :4].transpose(1, 2, 0)                    # [3, 4, N]
    poses = np.concatenate(
        [poses, np.tile(hwf[..., None], (1, 1, poses.shape[-1]))], 1
    )                                                            # [3, 5, N]
    # [r, -u, t] -> [-u, r, -t]
    poses = np.concatenate(
        [poses[:, 1:2], poses[:, 0:1], -poses[:, 2:3], poses[:, 3:4], poses[:, 4:5]],
        1,
    )

    pts3d = read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    return poses, pts3d, perm


def save_poses_bounds(basedir: str, poses: np.ndarray, pts3d, perm) -> np.ndarray:
    """Per-image visible-point depth percentiles -> poses_bounds.npy
    (`pose_utils.py:56-90`)."""
    n_images = poses.shape[-1]
    pts, vis = [], []
    for k in pts3d:
        p = pts3d[k]
        pts.append(p.xyz)
        row = np.zeros(n_images, np.int8)
        for ind in p.image_ids:
            if ind - 1 < n_images:
                row[ind - 1] = 1
        vis.append(row)
    pts_arr = np.asarray(pts)              # [P, 3]
    vis_arr = np.asarray(vis)              # [P, N]

    # depth of each point along each camera's forward axis (-t column)
    rel = pts_arr[:, None, :] - poses[:3, 3, :].T[None]           # [P, N, 3]
    zvals = np.sum(-rel * poses[:3, 2, :].T[None], -1)            # [P, N]

    rows = []
    for i in perm:
        zs = zvals[vis_arr[:, i] == 1, i]
        close, inf = np.percentile(zs, 0.5), np.percentile(zs, 99.5)
        rows.append(np.concatenate([poses[..., i].ravel(), [close, inf]]))
    arr = np.asarray(rows)
    np.save(os.path.join(basedir, "poses_bounds.npy"), arr)
    return arr


def gen_poses(basedir: str, match_type: str = "exhaustive_matcher",
              colmap_bin: Optional[str] = None) -> np.ndarray:
    """Full pipeline (`pose_utils.py:259-284`): run COLMAP if the sparse model
    is missing, then convert to poses_bounds.npy. Returns the [N, 17] array."""
    needed = {f"{n}.bin" for n in ("cameras", "images", "points3D")}
    sparse0 = os.path.join(basedir, "sparse", "0")
    have = set(os.listdir(sparse0)) if os.path.isdir(sparse0) else set()
    if not needed.issubset(have):
        run_colmap(basedir, match_type, colmap_bin)
    poses, pts3d, perm = load_colmap_model(basedir)
    return save_poses_bounds(basedir, poses, pts3d, perm)
