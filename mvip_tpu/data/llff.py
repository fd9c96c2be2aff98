"""LLFF / SPIn-NeRF scene ingestion.

Capability parity with `load_llff_data` (`DS_NeRF/load_llff.py:308-429`) and its
helpers `_load_data`/`_minify`/`recenter_poses`/`spherify_poses`/`render_path_spiral`
(`load_llff.py:14-305`):

  * `poses_bounds.npy` (N x 17) -> 3x5 pose/hwf matrices + near/far bounds,
  * image pyramid `images_{factor}/` (built with PIL here instead of the reference's
    ImageMagick `mogrify` subprocess, `load_llff.py:55`),
  * RGB from `RGB_inpainted/` (or raw images when `prepare`), masks from `label/`,
    inpainted depth maps from `Depth_inpainted/`,
  * axis fix [-u, r, -t] -> [r, u, -t], bound rescale by 1/(bds.min()*bd_factor),
    pose recentering, optional spherification, spiral render path,
  * the SPIn-NeRF train-view slice: the reference hard-slices `poses[40:]`
    (`load_llff.py:427`) because `RGB_inpainted/` holds only the last 60 of 100
    views; we generalize to "align poses to the last len(images) views" and keep
    the behavior documented + testable.

Known reference quirk reproduced knowingly: `spherify_hack=True` (the default) is a
net no-op — `spherify_poses` scales `bds` in place, the hack divides it back, and the
spherified render path is overwritten by the spiral path below (`load_llff.py:346-404`).
We therefore implement `spherify` (real) and skip the hack.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


# ------------------------------------------------------------------ pose algebra

def _normalize(x):
    return x / np.linalg.norm(x)


def view_matrix(z, up, pos) -> np.ndarray:
    """Camera-to-world basis from forward axis z, up hint, and position."""
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def poses_avg(poses: np.ndarray) -> np.ndarray:
    """Average c2w (poses [N, 3, 5] with hwf column)."""
    hwf = poses[0, :3, -1:]
    center = poses[:, :3, 3].mean(0)
    vec2 = _normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return np.concatenate([view_matrix(vec2, up, center), hwf], 1)


def recenter_poses(poses: np.ndarray) -> np.ndarray:
    """Rigidly transform all poses so their average becomes the identity."""
    out = poses.copy()
    bottom = np.array([[0, 0, 0, 1.0]])
    c2w = np.concatenate([poses_avg(poses)[:3, :4], bottom], 0)
    p44 = np.concatenate(
        [poses[:, :3, :4], np.tile(bottom[None], (len(poses), 1, 1))], 1
    )
    out[:, :3, :4] = (np.linalg.inv(c2w) @ p44)[:, :3, :4]
    return out


def render_path_spiral(c2w, up, rads, focal, zrate, rots, N) -> np.ndarray:
    """Spiral camera path around the average pose (`load_llff.py:245-258`)."""
    render_poses = []
    rads = np.asarray(list(rads) + [1.0])
    hwf = c2w[:, 4:5]
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, N + 1)[:-1]:
        c = c2w[:3, :4] @ (
            np.array([np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]) * rads
        )
        z = _normalize(c - c2w[:3, :4] @ np.array([0, 0, -focal, 1.0]))
        render_poses.append(np.concatenate([view_matrix(z, up, c), hwf], 1))
    return np.stack(render_poses)


def spherify_poses(poses: np.ndarray, bds: np.ndarray):
    """Re-orient an inward-facing capture onto a sphere (`load_llff.py:245-305`).

    Returns (poses, render_poses, bds) — unlike the reference this does NOT mutate
    `bds` in place.
    """
    def p34_to_44(p):
        return np.concatenate(
            [p, np.tile(np.eye(4)[-1].reshape(1, 1, 4), (len(p), 1, 1))], 1
        )

    rays_d = poses[:, :3, 2:3]
    rays_o = poses[:, :3, 3:4]

    A_i = np.eye(3) - rays_d * np.transpose(rays_d, (0, 2, 1))
    b_i = -A_i @ rays_o
    center = np.squeeze(
        -np.linalg.inv((np.transpose(A_i, (0, 2, 1)) @ A_i).mean(0)) @ b_i.mean(0)
    )
    up = (poses[:, :3, 3] - center).mean(0)

    vec0 = _normalize(up)
    vec1 = _normalize(np.cross([0.1, 0.2, 0.3], vec0))
    vec2 = _normalize(np.cross(vec0, vec1))
    c2w = np.stack([vec1, vec2, vec0, center], 1)

    poses_reset = np.linalg.inv(p34_to_44(c2w[None])) @ p34_to_44(poses[:, :3, :4])
    rad = np.sqrt(np.mean(np.sum(poses_reset[:, :3, 3] ** 2, -1)))
    sc = 1.0 / rad
    poses_reset[:, :3, 3] *= sc
    bds = bds * sc
    rad *= sc

    centroid = poses_reset[:, :3, 3].mean(0)
    zh = centroid[2]
    radcircle = np.sqrt(rad**2 - zh**2)
    new_poses = []
    for th in np.linspace(0.0, 2.0 * np.pi, 120):
        camorigin = np.array([radcircle * np.cos(th), radcircle * np.sin(th), zh])
        up = np.array([0, 0, -1.0])
        vec2 = _normalize(camorigin)
        vec0 = _normalize(np.cross(vec2, up))
        vec1 = _normalize(np.cross(vec2, vec0))
        new_poses.append(np.stack([vec0, vec1, vec2, camorigin], 1))
    new_poses = np.stack(new_poses)

    hwf = np.broadcast_to(poses[0, :3, -1:], new_poses[:, :3, -1:].shape)
    new_poses = np.concatenate([new_poses, hwf], -1)
    poses_reset = np.concatenate(
        [poses_reset[:, :3, :4], np.broadcast_to(poses[0, :3, -1:], poses_reset[:, :3, -1:].shape)],
        -1,
    )
    return poses_reset, new_poses, bds


# -------------------------------------------------------------------- image I/O

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".JPG", ".JPEG", ".PNG")


def _list_images(d: str) -> List[str]:
    return [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if f.endswith(_IMG_EXTS) and "cutout" not in f and "pseudo" not in f
    ]


def _imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path))


def minify(basedir: str, factor: int) -> str:
    """Build `images_{factor}/` from `images/` if missing (PIL resize — replaces the
    reference's `mogrify` subprocess)."""
    out = os.path.join(basedir, f"images_{factor}")
    if os.path.exists(out):
        return out
    from PIL import Image as PILImage

    src = os.path.join(basedir, "images")
    os.makedirs(out)
    for f in _list_images(src):
        im = PILImage.open(f)
        w, h = im.size
        im = im.resize((w // factor, h // factor), PILImage.LANCZOS)
        name = os.path.splitext(os.path.basename(f))[0] + ".png"
        im.save(os.path.join(out, name))
    return out


def _load_gray_stack(files: List[str], hw: Tuple[int, int], norm_max: bool) -> np.ndarray:
    """Masks (`norm_max=True`: /max) or depth maps (`norm_max=False`: /255)."""
    out = []
    for f in files:
        try:
            m = _imread(f).astype(np.float64)
            m = m / (max(float(m.max()), 1e-8) if norm_max else 255.0)
            if m.ndim > 2:
                m = m[..., 0]
            if m.shape != hw:
                import cv2

                m = cv2.resize(m, (hw[1], hw[0]), interpolation=cv2.INTER_NEAREST)
            out.append(m)
        except (FileNotFoundError, OSError):
            out.append(-np.ones(hw))
    return np.stack(out).astype(np.float32)


# ------------------------------------------------------------------ scene loader

@dataclass
class LLFFScene:
    images: np.ndarray            # [N, H, W, 3] float32 in [0, 1]
    poses: np.ndarray             # [N, 3, 4] c2w
    bds: np.ndarray               # [N, 2] near/far per view
    render_poses: np.ndarray      # [M, 3, 5] spiral path (with hwf col)
    i_test: int
    masks: np.ndarray             # [N, H, W] float32 (1 = inpaint region)
    inpainted_depths: np.ndarray  # [N, H, W] float32
    hwf: Tuple[int, int, float]
    near: float
    far: float

    @property
    def H(self):
        return self.hwf[0]

    @property
    def W(self):
        return self.hwf[1]

    @property
    def focal(self):
        return self.hwf[2]


def _scene_cache_file(basedir: str, factor: int, prepare: bool,
                      recenter: bool, bd_factor, spherify: bool,
                      path_zflat: bool) -> Optional[str]:
    """Cache key for a parsed scene: datadir identity + every loader knob +
    the newest mtime under the image pyramid (stale on any re-export).

    The reference memoizes the expensive half of ingestion the same way
    (`DS_NeRF/load_llff.py:491-495` writes `colmap_depth.npy` into the scene
    dir); our scene dirs can be mounted read-only, so the cache lives under
    `~/.cache/mvip_scenes` instead. Disable with MVIP_SCENE_CACHE=0."""
    if os.environ.get("MVIP_SCENE_CACHE", "1") == "0":
        return None
    import hashlib

    try:
        stamps = [os.path.getmtime(os.path.join(basedir, "poses_bounds.npy"))]
        sfx = f"_{factor}" if factor and factor != 1 else ""
        imgroot = os.path.join(basedir, "images" + sfx)
        for root, _, files in os.walk(imgroot):
            stamps.extend(
                os.path.getmtime(os.path.join(root, f)) for f in files
            )
    except OSError:
        return None
    key = repr((os.path.abspath(basedir), factor, prepare, recenter,
                bd_factor, spherify, path_zflat, len(stamps), max(stamps)))
    h = hashlib.sha256(key.encode()).hexdigest()[:24]
    d = os.path.join(os.path.expanduser("~"), ".cache", "mvip_scenes")
    return os.path.join(d, f"llff_{h}.npz")


def _scene_cache_load(path: Optional[str]) -> Optional[LLFFScene]:
    if not path or not os.path.exists(path):
        return None
    try:
        z = np.load(path)
        return LLFFScene(
            images=z["images"], poses=z["poses"], bds=z["bds"],
            render_poses=z["render_poses"], i_test=int(z["i_test"]),
            masks=z["masks"], inpainted_depths=z["inpainted_depths"],
            hwf=(int(z["hwf"][0]), int(z["hwf"][1]), float(z["hwf"][2])),
            near=float(z["near"]), far=float(z["far"]),
        )
    except Exception:
        return None  # corrupt/partial cache: fall through to a fresh parse


def _scene_cache_save(path: Optional[str], s: LLFFScene) -> None:
    if not path:
        return
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}.npz"  # savez keeps names ending .npz
        np.savez(tmp, images=s.images, poses=s.poses, bds=s.bds,
                 render_poses=s.render_poses, i_test=s.i_test, masks=s.masks,
                 inpainted_depths=s.inpainted_depths,
                 hwf=np.asarray(s.hwf, np.float64), near=s.near, far=s.far)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is best-effort; never fail the load over it


def load_llff_scene(
    basedir: str,
    factor: int = 4,
    recenter: bool = True,
    bd_factor: Optional[float] = 0.75,
    spherify: bool = False,
    prepare: bool = False,
    path_zflat: bool = False,
) -> LLFFScene:
    cache = _scene_cache_file(basedir, factor, prepare, recenter, bd_factor,
                              spherify, path_zflat)
    cached = _scene_cache_load(cache)
    if cached is not None:
        return cached
    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape(-1, 3, 5)          # [N, 3, 5]
    bds = poses_arr[:, -2:]                              # [N, 2]

    sfx = f"_{factor}" if factor and factor != 1 else ""
    if sfx:
        minify(basedir, factor)
    imgroot = os.path.join(basedir, "images" + sfx)
    imgdir = imgroot if prepare else os.path.join(imgroot, "RGB_inpainted")
    if not os.path.isdir(imgdir):
        raise FileNotFoundError(imgdir)
    mskdir = os.path.join(imgroot, "label")
    depthdir = os.path.join(imgroot, "Depth_inpainted")

    imgfiles = _list_images(imgdir)
    stems = [os.path.splitext(os.path.basename(f))[0] for f in imgfiles]
    mskfiles = [os.path.join(mskdir, s + ".png") for s in stems]
    if os.path.isdir(depthdir):
        depthfiles = [os.path.join(depthdir, s + ".png") for s in stems]
    else:
        depthfiles = mskfiles

    imgs = np.stack([_imread(f)[..., :3] / 255.0 for f in imgfiles]).astype(np.float32)
    N, H, W = imgs.shape[:3]
    masks = _load_gray_stack(mskfiles, (H, W), norm_max=True)
    masks = masks / max(masks.max(), 1e-8)
    inpainted_depths = _load_gray_stack(depthfiles, (H, W), norm_max=False)

    # hwf column: actual loaded image shape; focal scaled by the pyramid factor
    poses[:, :2, 4] = np.array([H, W], np.float64)
    poses[:, 2, 4] = poses[:, 2, 4] / (factor or 1)

    # axis fix [-u, r, -t] -> [r, u, -t]
    poses = np.concatenate([poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], 2)
    poses = poses.astype(np.float32)
    bds = bds.astype(np.float32)

    sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
    poses[:, :3, 3] *= sc
    bds = bds * sc

    if recenter:
        poses = recenter_poses(poses)
    if spherify:
        poses, _, bds = spherify_poses(poses, bds)
    # (reference `spherify_hack` default branch is a documented no-op — skipped)

    # spiral render path from the average pose
    c2w = poses_avg(poses)
    up = _normalize(poses[:, :3, 1].sum(0))
    close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
    dt = 0.75
    focal_spiral = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)
    rads = np.percentile(np.abs(poses[:, :3, 3]), 90, 0)
    c2w_path = c2w.copy()
    n_views, n_rots = 120, 2
    if path_zflat:
        c2w_path[:3, 3] += -close_depth * 0.1 * c2w_path[:3, 2]
        rads[2] = 0.0
        n_rots, n_views = 1, 60
    render_poses = render_path_spiral(
        c2w_path, up, rads, focal_spiral, zrate=0.5, rots=n_rots, N=n_views
    ).astype(np.float32)

    # SPIn-NeRF alignment: pose list may cover more views than the (inpainted)
    # image set; keep the LAST len(images) poses (reference: poses[40:] for 60
    # images of 100, `load_llff.py:427`).
    if len(poses) > N:
        poses = poses[len(poses) - N:]
        bds = bds[len(bds) - N:]

    # held-out pick AFTER the slice: over the full set it could index past the
    # returned arrays (or land 40 views off) on the SPIn-NeRF layout
    i_test = int(np.argmin(np.sum((c2w[:3, 3] - poses[:, :3, 3]) ** 2, -1)))

    hwf = (H, W, float(poses[0, 2, 4]))
    scene = LLFFScene(
        images=imgs,
        poses=poses[:, :3, :4],
        bds=bds,
        render_poses=render_poses,
        i_test=i_test,
        masks=masks,
        inpainted_depths=inpainted_depths,
        hwf=hwf,
        near=float(bds.min() * 0.9),
        far=float(bds.max() * 1.0),
    )
    _scene_cache_save(cache, scene)
    return scene
