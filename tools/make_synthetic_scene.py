#!/usr/bin/env python
"""Generate learnable multi-view-consistent synthetic scenes on disk.

This image ships no Blender-synthetic or DTU data (only SPIn-NeRF scene 1),
so BASELINE.json configs 2-3 quality runs use these generated scenes: an
analytic emission-absorption volume (three colored soft spheres over a white
or black background) ray-marched exactly — the same rendering model NeRF
fits, so a correct pipeline converges to high PSNR on held-out views, and a
wiring bug (pose convention, intrinsics, white-background compositing) shows
up as a hard quality ceiling.

Formats written:
  blender: transforms_{train,val,test}.json + {split}/r_i.png RGBA
           (reference loader: DS_NeRF/load_blender.py:36-57)
  dtu:     image/%06d.png + mask/%06d.png + cameras.npz world/scale mats
           (reference loader: DS_NeRF/load_dtu.py:6-76)

Usage: python tools/make_synthetic_scene.py {blender,dtu} OUTDIR [H W]
"""

import json
import os
import sys

import numpy as np

SPHERES = [  # center, radius, color, density
    (np.array([0.0, 0.0, 0.0]), 0.7, np.array([0.9, 0.25, 0.2]), 14.0),
    (np.array([0.75, 0.45, -0.3]), 0.35, np.array([0.2, 0.7, 0.95]), 18.0),
    (np.array([-0.7, -0.35, 0.45]), 0.42, np.array([0.95, 0.85, 0.2]), 16.0),
]


def render_view(c2w, H, W, focal, white_bkgd, n_steps=192, near=1.5, far=6.5):
    """Exact-enough emission-absorption march of the analytic volume."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - W * 0.5) / focal, -(j - H * 0.5) / focal,
                     -np.ones_like(i)], -1)
    rd = dirs @ c2w[:3, :3].T
    ro = np.broadcast_to(c2w[:3, 3], rd.shape)
    t = np.linspace(near, far, n_steps, dtype=np.float32)
    dt = t[1] - t[0]
    # march in chunks to bound memory on the 1-core host
    rgb = np.zeros((H * W, 3), np.float32)
    acc = np.zeros((H * W,), np.float32)
    ro_f, rd_f = ro.reshape(-1, 3), rd.reshape(-1, 3)
    for s in range(0, H * W, 4096):
        o, d = ro_f[s:s + 4096], rd_f[s:s + 4096]
        pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
        sigma = np.zeros(pts.shape[:2], np.float32)
        col = np.zeros(pts.shape[:2] + (3,), np.float32)
        for cen, rad, c, dens in SPHERES:
            dist2 = np.sum((pts - cen) ** 2, -1)
            contrib = dens * np.maximum(0.0, 1.0 - dist2 / (rad * rad))
            sigma += contrib
            col += contrib[..., None] * c
        col = col / np.maximum(sigma[..., None], 1e-8)
        norm = np.linalg.norm(d, axis=-1, keepdims=True)
        alpha = 1.0 - np.exp(-sigma * dt * norm)
        trans = np.cumprod(1.0 - alpha + 1e-10, axis=1)
        trans = np.concatenate([np.ones_like(trans[:, :1]), trans[:, :-1]], 1)
        w = alpha * trans
        rgb[s:s + 4096] = np.sum(w[..., None] * col, 1)
        acc[s:s + 4096] = np.sum(w, 1)
    rgb = rgb.reshape(H, W, 3)
    acc = acc.reshape(H, W)
    if white_bkgd:
        rgb = rgb + (1.0 - acc[..., None])
    return np.clip(rgb, 0, 1), np.clip(acc, 0, 1)


def look_at_pose(theta, phi, radius):
    """c2w for a camera on a sphere looking at the origin (-z forward)."""
    eye = radius * np.array([
        np.cos(phi) * np.sin(theta), np.sin(phi), np.cos(phi) * np.cos(theta)
    ])
    fwd = eye / np.linalg.norm(eye)            # camera -z points at origin
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, true_up, fwd, eye
    return c2w


def write_blender(root, H=100, W=100, n_train=30, n_val=5, n_test=10,
                  radius=4.0):
    import imageio.v2 as imageio

    cam_angle = 0.6911  # lego's camera_angle_x
    focal = 0.5 * W / np.tan(0.5 * cam_angle)
    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        sdir = os.path.join(root, split)
        os.makedirs(sdir, exist_ok=True)
        frames = []
        for k in range(n):
            theta = rng.uniform(0, 2 * np.pi)
            phi = rng.uniform(-0.1, 0.9)
            c2w = look_at_pose(theta, phi, radius)
            rgb, acc = render_view(c2w, H, W, focal, white_bkgd=False)
            rgba = np.concatenate([rgb, acc[..., None]], -1)
            imageio.imwrite(os.path.join(sdir, f"r_{k}.png"),
                            (rgba * 255).astype(np.uint8))
            frames.append({"file_path": f"./{split}/r_{k}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as fh:
            json.dump({"camera_angle_x": cam_angle, "frames": frames}, fh)
    print(f"blender scene -> {root} ({n_train}/{n_val}/{n_test} views)")


def write_dtu(root, H=100, W=120, n=35, radius=3.3):
    # radius chosen so the whole volume sits inside the loader's fixed
    # near/far [0.1, 5.0] (data/dtu.py DTUScene defaults)
    import imageio.v2 as imageio

    imgdir = os.path.join(root, "image")
    maskdir = os.path.join(root, "mask")
    os.makedirs(imgdir, exist_ok=True)
    os.makedirs(maskdir, exist_ok=True)
    focal = 1.2 * W
    K = np.array([[focal, 0, W / 2.0, 0], [0, focal, H / 2.0, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    rng = np.random.default_rng(1)
    cams = {}
    for k in range(n):
        theta = rng.uniform(0, 2 * np.pi)
        phi = rng.uniform(0.0, 0.7)
        c2w = look_at_pose(theta, phi, radius)
        rgb, acc = render_view(c2w, H, W, focal, white_bkgd=False)
        imageio.imwrite(os.path.join(imgdir, f"{k:06d}.png"),
                        (rgb * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(maskdir, f"{k:06d}.png"),
                        ((acc > 0.3) * 255).astype(np.uint8))
        # DTU convention: OpenCV-style projection; our look_at is OpenGL
        # (-z fwd), so flip y/z axes for the world matrix
        flip = np.diag([1.0, -1.0, -1.0, 1.0])
        w2c = np.linalg.inv(c2w @ flip)
        cams[f"world_mat_{k}"] = (K @ w2c).astype(np.float64)
        cams[f"scale_mat_{k}"] = np.eye(4)
    np.savez(os.path.join(root, "cameras.npz"), **cams)
    print(f"dtu scene -> {root} ({n} views)")


if __name__ == "__main__":
    kind = sys.argv[1]
    out = sys.argv[2]
    hw = (int(sys.argv[3]), int(sys.argv[4])) if len(sys.argv) > 4 else None
    os.makedirs(out, exist_ok=True)
    if kind == "blender":
        write_blender(out, *(hw or (100, 100)))
    elif kind == "dtu":
        write_dtu(out, *(hw or (100, 120)))
    else:
        raise SystemExit(f"unknown kind {kind}")
