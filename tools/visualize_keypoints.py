#!/usr/bin/env python
"""COLMAP keypoint visualizer.

Capability parity with `DS_NeRF/utils/visualization.py:8-54`
(`visualize_keypoints`): overlay each image's COLMAP keypoints (3-D-backed
point observations) onto the image and dump PNGs.

Usage:
    python tools/visualize_keypoints.py <scenedir> [--out viz_keypoints] [--factor 1]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvip_tpu.data.colmap import read_images_binary, read_points3d_binary


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("scenedir", type=str)
    parser.add_argument("--out", default="viz_keypoints")
    parser.add_argument("--factor", type=int, default=1,
                        help="image downsample factor dir (images_<f>)")
    parser.add_argument("--radius", type=int, default=2)
    args = parser.parse_args()

    import imageio.v2 as imageio

    sparse = os.path.join(args.scenedir, "sparse", "0")
    images = read_images_binary(os.path.join(sparse, "images.bin"))
    points = read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    imgdir = os.path.join(
        args.scenedir, "images" if args.factor == 1 else f"images_{args.factor}"
    )
    os.makedirs(args.out, exist_ok=True)

    for k in sorted(images.keys()):
        im = images[k]
        path = os.path.join(imgdir, im.name)
        if not os.path.exists(path):
            continue
        rgb = np.asarray(imageio.imread(path))[..., :3].copy()
        H, W = rgb.shape[:2]
        for xy, pid in zip(im.xys, im.point3D_ids):
            if pid == -1 or pid not in points:
                continue  # only 3-D-backed keypoints, as in the reference
            x, y = int(xy[0] / args.factor), int(xy[1] / args.factor)
            if 0 <= x < W and 0 <= y < H:
                r = args.radius
                rgb[max(0, y - r): y + r + 1, max(0, x - r): x + r + 1] = (255, 40, 40)
        out_path = os.path.join(args.out, os.path.splitext(im.name)[0] + "_kp.png")
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        imageio.imwrite(out_path, rgb)
        print(f"{im.name}: {np.sum(im.point3D_ids != -1)} keypoints -> {out_path}")


if __name__ == "__main__":
    main()
