"""NeRD-style scene ingestion.

Capability parity with `load_nerd_data` (`DS_NeRF/load_nerd.py:244-326`): LLFF-format
poses_bounds with raw images from `images_{factor}/` and binary masks from
`images_{factor}/masks/`; masks thresholded at 0.5; an `objects` tensor = image with
the unmasked region blanked to white (object on white background).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Tuple

import numpy as np

from mvip_tpu.data.llff import (
    _imread,
    _list_images,
    minify,
    poses_avg,
    recenter_poses,
    render_path_spiral,
    spherify_poses,
    _normalize,
)


@dataclass
class NeRDScene:
    images: np.ndarray
    poses: np.ndarray         # [N, 3, 4]
    bds: np.ndarray
    render_poses: np.ndarray
    i_test: int
    masks: np.ndarray
    objects: np.ndarray
    hwf: Tuple[int, int, float]


def load_nerd_scene(
    basedir: str,
    factor: int = 8,
    recenter: bool = True,
    bd_factor: float = 0.75,
    spherify: bool = False,
) -> NeRDScene:
    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape(-1, 3, 5)
    bds = poses_arr[:, -2:]

    sfx = f"_{factor}" if factor and factor != 1 else ""
    if sfx:
        minify(basedir, factor)
    imgdir = os.path.join(basedir, "images" + sfx)
    mskdir = os.path.join(imgdir, "masks")

    imgfiles = _list_images(imgdir)
    imgs = np.stack([_imread(f)[..., :3] / 255.0 for f in imgfiles]).astype(np.float32)
    N, H, W = imgs.shape[:3]
    mskfiles = [os.path.join(mskdir, os.path.basename(f)) for f in imgfiles]
    masks = np.stack([_imread(f) / 255.0 for f in mskfiles]).astype(np.float32)
    if masks.ndim == 4:
        masks = masks[..., 0]

    poses[:, :2, 4] = np.array([H, W], np.float64)
    poses[:, 2, 4] = poses[:, 2, 4] / (factor or 1)
    poses = np.concatenate([poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], 2)
    poses = poses.astype(np.float32)
    bds = bds.astype(np.float32)

    sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
    poses[:, :3, 3] *= sc
    bds = bds * sc
    if recenter:
        poses = recenter_poses(poses)

    if spherify:
        poses, render_poses, bds = spherify_poses(poses, bds)
    else:
        c2w = poses_avg(poses)
        up = _normalize(poses[:, :3, 1].sum(0))
        close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
        focal_spiral = 1.0 / (0.25 / close_depth + 0.75 / inf_depth)
        rads = np.percentile(np.abs(poses[:, :3, 3]), 90, 0)
        render_poses = render_path_spiral(
            c2w, up, rads, focal_spiral, zrate=0.5, rots=2, N=120
        )
    render_poses = np.asarray(render_poses, np.float32)

    c2w = poses_avg(poses)
    i_test = int(np.argmin(np.sum((c2w[:3, 3] - poses[:, :3, 3]) ** 2, -1)))

    masks = (masks > 0.5).astype(np.float32)
    objects = imgs.copy()
    m3 = np.repeat(masks[..., None], 3, -1)
    objects[m3 == 0] = 0.0
    objects = objects + (1.0 - m3)

    return NeRDScene(
        images=imgs,
        poses=poses[:, :3, :4],
        bds=bds,
        render_poses=render_poses,
        i_test=i_test,
        masks=masks,
        objects=objects,
        hwf=(int(H), int(W), float(poses[0, 2, 4])),
    )
