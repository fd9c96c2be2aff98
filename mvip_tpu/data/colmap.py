"""COLMAP sparse-model I/O.

Capability parity with the reference's vendored COLMAP scripts
(`DS_NeRF/colmapUtils/read_write_model.py:74-478`): read/write cameras, images and
3-D points in both the binary and text formats, quaternion <-> rotation-matrix
conversion. The on-disk formats are COLMAP's documented layouts, parsed here with
vectorized numpy record reads rather than per-record `struct.unpack` loops.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

# model_id -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}
CAMERA_MODEL_PARAMS = {name: n for _, (name, n) in CAMERA_MODELS.items()}


@dataclass
class Camera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclass
class Image:
    id: int
    qvec: np.ndarray
    tvec: np.ndarray
    camera_id: int
    name: str
    xys: np.ndarray        # [P, 2]
    point3D_ids: np.ndarray  # [P] int64, -1 = no 3D point


@dataclass
class Point3D:
    id: int
    xyz: np.ndarray
    rgb: np.ndarray
    error: float
    image_ids: np.ndarray
    point2D_idxs: np.ndarray


def qvec2rotmat(qvec: np.ndarray) -> np.ndarray:
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def rotmat2qvec(R: np.ndarray) -> np.ndarray:
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


# ---------------------------------------------------------------- binary readers

def read_cameras_binary(path: str) -> Dict[int, Camera]:
    cameras = {}
    with open(path, "rb") as fh:
        (n,) = struct.unpack("<Q", fh.read(8))
        for _ in range(n):
            cid, model_id, width, height = struct.unpack("<iiQQ", fh.read(24))
            name, num_params = CAMERA_MODELS[model_id]
            params = np.frombuffer(fh.read(8 * num_params), "<f8")
            cameras[cid] = Camera(cid, name, width, height, params.copy())
    return cameras


def read_images_binary(path: str) -> Dict[int, Image]:
    images = {}
    with open(path, "rb") as fh:
        (n,) = struct.unpack("<Q", fh.read(8))
        for _ in range(n):
            iid = struct.unpack("<i", fh.read(4))[0]
            qt = np.frombuffer(fh.read(56), "<f8")
            cam_id = struct.unpack("<i", fh.read(4))[0]
            name = b""
            while True:
                c = fh.read(1)
                if c == b"\x00":
                    break
                name += c
            (npts,) = struct.unpack("<Q", fh.read(8))
            rec = np.frombuffer(fh.read(24 * npts), dtype=[("xy", "<f8", 2), ("pid", "<i8")])
            images[iid] = Image(
                iid, qt[:4].copy(), qt[4:7].copy(), cam_id, name.decode("utf-8"),
                rec["xy"].copy(), rec["pid"].copy(),
            )
    return images


def read_points3d_binary(path: str) -> Dict[int, Point3D]:
    points = {}
    with open(path, "rb") as fh:
        (n,) = struct.unpack("<Q", fh.read(8))
        for _ in range(n):
            buf = fh.read(43)
            pid, x, y, z, r, g, b, err = struct.unpack("<qdddBBBd", buf)
            (tlen,) = struct.unpack("<Q", fh.read(8))
            track = np.frombuffer(fh.read(8 * tlen), dtype=[("iid", "<i4"), ("p2d", "<i4")])
            points[pid] = Point3D(
                pid, np.array([x, y, z]), np.array([r, g, b], np.uint8), err,
                track["iid"].copy(), track["p2d"].copy(),
            )
    return points


# ------------------------------------------------------------------ text readers

def read_cameras_text(path: str) -> Dict[int, Camera]:
    cameras = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            toks = line.split()
            cid = int(toks[0])
            cameras[cid] = Camera(
                cid, toks[1], int(toks[2]), int(toks[3]), np.array(toks[4:], float)
            )
    return cameras


def read_images_text(path: str) -> Dict[int, Image]:
    images = {}
    with open(path) as fh:
        # keep EMPTY lines: an image with zero keypoints writes a blank points
        # line, and dropping it would misalign every following header/points pair
        lines = [l.strip() for l in fh if not l.startswith("#")]
    while lines and not lines[-1]:
        lines.pop()
    for head, pts in zip(lines[0::2], lines[1::2]):
        toks = head.split()
        iid = int(toks[0])
        qvec = np.array(toks[1:5], float)
        tvec = np.array(toks[5:8], float)
        cam_id = int(toks[8])
        name = toks[9]
        ptoks = np.array(pts.split(), float).reshape(-1, 3) if pts else np.zeros((0, 3))
        images[iid] = Image(
            iid, qvec, tvec, cam_id, name, ptoks[:, :2], ptoks[:, 2].astype(np.int64)
        )
    return images


def read_points3d_text(path: str) -> Dict[int, Point3D]:
    points = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            toks = line.split()
            pid = int(toks[0])
            track = np.array(toks[8:], float).reshape(-1, 2)
            points[pid] = Point3D(
                pid,
                np.array(toks[1:4], float),
                np.array(toks[4:7], float).astype(np.uint8),
                float(toks[7]),
                track[:, 0].astype(np.int32),
                track[:, 1].astype(np.int32),
            )
    return points


# ---------------------------------------------------------------------- writers

def write_cameras_binary(cameras: Dict[int, Camera], path: str) -> None:
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(cameras)))
        for cam in cameras.values():
            fh.write(
                struct.pack(
                    "<iiQQ", cam.id, CAMERA_MODEL_IDS[cam.model], cam.width, cam.height
                )
            )
            fh.write(np.asarray(cam.params, "<f8").tobytes())


def write_images_binary(images: Dict[int, Image], path: str) -> None:
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(images)))
        for im in images.values():
            fh.write(struct.pack("<i", im.id))
            fh.write(np.concatenate([im.qvec, im.tvec]).astype("<f8").tobytes())
            fh.write(struct.pack("<i", im.camera_id))
            fh.write(im.name.encode("utf-8") + b"\x00")
            fh.write(struct.pack("<Q", len(im.point3D_ids)))
            rec = np.zeros(len(im.point3D_ids), dtype=[("xy", "<f8", 2), ("pid", "<i8")])
            rec["xy"], rec["pid"] = im.xys, im.point3D_ids
            fh.write(rec.tobytes())


def write_points3d_binary(points: Dict[int, Point3D], path: str) -> None:
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(points)))
        for pt in points.values():
            fh.write(
                struct.pack(
                    "<qdddBBBd", pt.id, *pt.xyz, *np.asarray(pt.rgb, np.uint8), pt.error
                )
            )
            fh.write(struct.pack("<Q", len(pt.image_ids)))
            rec = np.zeros(len(pt.image_ids), dtype=[("iid", "<i4"), ("p2d", "<i4")])
            rec["iid"], rec["p2d"] = pt.image_ids, pt.point2D_idxs
            fh.write(rec.tobytes())


def write_cameras_text(cameras: Dict[int, Camera], path: str) -> None:
    with open(path, "w") as fh:
        fh.write("# Camera list: CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        for cam in cameras.values():
            params = " ".join(repr(float(p)) for p in np.asarray(cam.params).tolist())
            fh.write(f"{cam.id} {cam.model} {cam.width} {cam.height} {params}\n")


def write_images_text(images: Dict[int, Image], path: str) -> None:
    with open(path, "w") as fh:
        fh.write("# Image list: IMAGE_ID, QW QX QY QZ, TX TY TZ, CAMERA_ID, NAME\n")
        for im in images.values():
            q = " ".join(repr(float(v)) for v in im.qvec.tolist())
            t = " ".join(repr(float(v)) for v in im.tvec.tolist())
            fh.write(f"{im.id} {q} {t} {im.camera_id} {im.name}\n")
            pts = " ".join(
                f"{float(x)!r} {float(y)!r} {int(pid)}"
                for (x, y), pid in zip(im.xys, im.point3D_ids)
            )
            fh.write(pts + "\n")


def write_points3d_text(points: Dict[int, Point3D], path: str) -> None:
    with open(path, "w") as fh:
        fh.write("# 3D point list: POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[]\n")
        for pt in points.values():
            xyz = " ".join(repr(float(v)) for v in pt.xyz.tolist())
            rgb = " ".join(str(int(v)) for v in np.asarray(pt.rgb).tolist())
            track = " ".join(
                f"{int(i)} {int(j)}" for i, j in zip(pt.image_ids, pt.point2D_idxs)
            )
            fh.write(f"{pt.id} {xyz} {rgb} {float(pt.error)!r} {track}\n")


# ------------------------------------------------------------------- high level

def read_model(path: str, ext: str = ".bin") -> Tuple[dict, dict, dict]:
    if ext == ".bin":
        return (
            read_cameras_binary(os.path.join(path, "cameras.bin")),
            read_images_binary(os.path.join(path, "images.bin")),
            read_points3d_binary(os.path.join(path, "points3D.bin")),
        )
    return (
        read_cameras_text(os.path.join(path, "cameras.txt")),
        read_images_text(os.path.join(path, "images.txt")),
        read_points3d_text(os.path.join(path, "points3D.txt")),
    )


def write_model(cameras, images, points, path: str, ext: str = ".bin") -> None:
    os.makedirs(path, exist_ok=True)
    if ext == ".bin":
        write_cameras_binary(cameras, os.path.join(path, "cameras.bin"))
        write_images_binary(images, os.path.join(path, "images.bin"))
        write_points3d_binary(points, os.path.join(path, "points3D.bin"))
    else:
        write_cameras_text(cameras, os.path.join(path, "cameras.txt"))
        write_images_text(images, os.path.join(path, "images.txt"))
        write_points3d_text(points, os.path.join(path, "points3D.txt"))
