"""DTU scene ingestion.

Capability parity with `load_dtu_data` (`DS_NeRF/load_dtu.py:6-71`): images from
`image/`, projection matrices from `cameras.npz` (`world_mat_i`, normalized by
`scale_mat_i`), camera intrinsics/extrinsics via projection-matrix decomposition,
focal averaged over views, poses flipped into the NeRF (-y, -z) convention.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Tuple

import numpy as np


def decompose_projection(P: np.ndarray):
    """RQ-based decomposition of a 3x4 projection into (K, R, c) — the math behind
    cv2.decomposeProjectionMatrix, implemented with numpy to avoid the cv2 runtime
    on the data path."""
    M = P[:3, :3]
    # RQ decomposition via flipped QR
    rev = np.flipud(np.eye(3))
    q, r = np.linalg.qr((rev @ M).T)
    K = rev @ r.T @ rev
    R = rev @ q.T
    # enforce positive diagonal of K
    sgn = np.sign(np.diag(K))
    sgn[sgn == 0] = 1
    S = np.diag(sgn)
    K, R = K @ S, S @ R
    if np.linalg.det(R) < 0:
        K, R = -K, -R
    # camera center: null space of P (homogeneous)
    _, _, vt = np.linalg.svd(P)
    c = vt[-1]
    return K / K[2, 2], R, c


@dataclass
class DTUScene:
    images: np.ndarray  # [N, H, W, 3]
    poses: np.ndarray   # [N, 3, 4]
    hwf: Tuple[int, int, float]
    near: float = 0.1
    far: float = 5.0


def load_dtu_scene(path: str) -> DTUScene:
    import imageio.v2 as imageio

    imgdir = os.path.join(path, "image")
    imgfiles = [
        os.path.join(imgdir, f)
        for f in sorted(os.listdir(imgdir))
        if f.lower().endswith((".jpg", ".png", ".jpeg"))
    ]
    imgs = np.stack([np.asarray(imageio.imread(f))[..., :3] / 255.0 for f in imgfiles])
    imgs = imgs.astype(np.float32)
    n = len(imgs)

    cams = np.load(os.path.join(path, "cameras.npz"))
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)

    poses, focal = [], 0.0
    for i in range(n):
        P = cams[f"world_mat_{i}"][:3]
        K, R, c = decompose_projection(P)
        focal += (K[0, 0] + K[1, 1]) / 2.0
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R.T
        pose[:3, 3] = (c[:3] / c[3])
        scale = cams.get(f"scale_mat_{i}")
        if scale is not None:
            pose[:3, 3:] -= scale[:3, 3:]
            pose[:3, 3:] /= np.diagonal(scale[:3, :3])[..., None]
        poses.append((flip @ pose @ flip)[:3, :4])

    H, W = imgs.shape[1:3]
    return DTUScene(
        images=imgs,
        poses=np.stack(poses),
        hwf=(int(H), int(W), float(focal / n)),
    )
