"""Blender-synthetic scene ingestion.

Capability parity with `load_blender_data` (`DS_NeRF/load_blender.py:36-107`):
transforms_{train,val,test}.json, RGBA images kept 4-channel, per-train-frame masks
(`mask/m_*.png`) and object layers (`object/o_*.png`), 40-pose spherical render path
at theta in [-180, 180), phi = -30, radius 4, optional half-resolution downsampling.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


def _trans_t(t):
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = t
    return m


def _rot_phi(phi):
    c, s = np.cos(phi), np.sin(phi)
    m = np.eye(4, dtype=np.float32)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def _rot_theta(th):
    c, s = np.cos(th), np.sin(th)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, -s, s, c
    return m


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """Spherical camera pose (`load_blender.py:28-33`)."""
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta / 180.0 * np.pi) @ c2w
    return (
        np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32)
        @ c2w
    )


@dataclass
class BlenderScene:
    images: np.ndarray        # [N, H, W, 4] RGBA float32
    poses: np.ndarray         # [N, 4, 4]
    render_poses: np.ndarray  # [40, 4, 4]
    hwf: Tuple[int, int, float]
    i_split: List[np.ndarray]  # train / val / test indices
    masks: np.ndarray          # [N_train, H, W]
    objects: np.ndarray        # [N_train, H, W, 4]


def load_blender_scene(basedir: str, half_res: bool = False, testskip: int = 1) -> BlenderScene:
    import imageio.v2 as imageio

    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json")) as fh:
            metas[s] = json.load(fh)

    all_imgs, all_poses, masks, objects, counts = [], [], [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = 1 if (s == "train" or testskip == 0) else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            fname = os.path.join(basedir, frame["file_path"] + ".png")
            if s == "train":
                d, base = os.path.split(fname)
                stem = base[len("r_"):-len(".png")] if base.startswith("r_") else os.path.splitext(base)[0]
                root = os.path.dirname(d)
                mpath = os.path.join(root, "mask", f"m_{stem}.png")
                opath = os.path.join(root, "object", f"o_{stem}.png")
                img_probe = np.asarray(imageio.imread(fname))
                # a missing mask/object file appends a zero placeholder — the
                # arrays are documented index-aligned with train frames, and a
                # silent skip would shift every later frame's mask by one
                if os.path.exists(mpath):
                    masks.append(np.asarray(imageio.imread(mpath)))
                elif masks:
                    masks.append(np.zeros_like(masks[-1]))
                if os.path.exists(opath):
                    objects.append(np.asarray(imageio.imread(opath)))
                elif objects:
                    objects.append(np.zeros_like(objects[-1]))
                imgs.append(img_probe)
                poses.append(np.array(frame["transform_matrix"], np.float32))
                continue
            imgs.append(np.asarray(imageio.imread(fname)))
            poses.append(np.array(frame["transform_matrix"], np.float32))
        imgs = (np.stack(imgs) / 255.0).astype(np.float32)  # RGBA kept
        counts.append(counts[-1] + len(imgs))
        all_imgs.append(imgs)
        all_poses.append(np.stack(poses))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs)
    poses = np.concatenate(all_poses)
    masks_arr = (np.stack(masks).astype(np.float32) / 255.0) if masks else np.zeros((0,))
    objects_arr = (np.stack(objects).astype(np.float32) / 255.0) if objects else np.zeros((0,))

    H, W = imgs.shape[1:3]
    focal = 0.5 * W / np.tan(0.5 * float(metas["test"]["camera_angle_x"]))
    render_poses = np.stack(
        [pose_spherical(a, -30.0, 4.0) for a in np.linspace(-180, 180, 41)[:-1]]
    )

    if half_res:
        import cv2

        H, W, focal = H // 2, W // 2, focal / 2.0
        imgs = np.stack(
            [cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA) for im in imgs]
        ).astype(np.float32)
        if masks_arr.size:
            masks_arr = np.stack(
                [cv2.resize(m, (W, H), interpolation=cv2.INTER_AREA) for m in masks_arr]
            ).astype(np.float32)
        if objects_arr.size:
            objects_arr = np.stack(
                [cv2.resize(o, (W, H), interpolation=cv2.INTER_AREA) for o in objects_arr]
            ).astype(np.float32)

    return BlenderScene(
        images=imgs,
        poses=poses,
        render_poses=render_poses,
        hwf=(int(H), int(W), float(focal)),
        i_split=i_split,
        masks=masks_arr,
        objects=objects_arr,
    )
