"""Image/video output helpers (`DS_NeRF/run_nerf_helpers.py:18`, `run.py:1055-1088`)."""

from __future__ import annotations

import os

import numpy as np


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def save_image(path: str, img: np.ndarray) -> None:
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, to8b(img) if img.dtype != np.uint8 else img)


def save_video(path: str, frames: np.ndarray, fps: int = 30, quality: int = 8) -> None:
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = to8b(frames) if frames.dtype != np.uint8 else frames
    try:
        imageio.mimwrite(path, frames, fps=fps, quality=quality)
    except Exception:
        # ffmpeg unavailable: fall back to per-frame pngs next to the target
        stem = os.path.splitext(path)[0]
        for i, f in enumerate(frames):
            imageio.imwrite(f"{stem}_{i:04d}.png", f)
