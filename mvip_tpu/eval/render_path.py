"""Offline render paths: spiral/test-set videos and per-frame artifact trees.

Parity: `render_path` (`DS_NeRF/run.py:1222-1362`) — renders a pose list at an
optional `render_factor` downsampling, collects rgb/disp stacks, optionally writes
per-frame `rgb/ depth/ disp/ weight/ z/ pose/ alpha/` trees; and
`render_path_4view` (`run.py:1365-1401`) — the <=5 neighboring train views around
the current iteration used by collaborative SDS.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvip_tpu.render.renderer import RenderOptions, render_image
from mvip_tpu.utils.imaging import save_image


def save_frame_tree(savedir: str, idx: int, frame: Dict[str, np.ndarray],
                    pose: np.ndarray, gt: Optional[np.ndarray] = None) -> None:
    """Write one frame into the reference's render-tree directory contract
    (`DS_NeRF/run.py:1286-1350`): `rgb/{i:06d}.png`, `depth|disp|weight|z
    [|alpha]/{i:06d}.npy`, `pose/{i:06d}.txt` (4x4), `images/{i:06d}.png` for
    GT when given — plus our acc npy and a normalized disp png preview."""
    rgb = np.nan_to_num(frame["rgb"])
    save_image(os.path.join(savedir, "rgb", f"{idx:06d}.png"), rgb)
    if gt is not None:
        save_image(os.path.join(savedir, "images", f"{idx:06d}.png"),
                   np.nan_to_num(np.asarray(gt)))
    d = frame["disp"]
    save_image(os.path.join(savedir, "disp", f"{idx:06d}.png"),
               d / max(float(np.nanmax(d)), 1e-8))
    npy = {"depth": "depth", "disp": "disp", "acc": "acc",
           "weights": "weight", "z_vals": "z", "alpha": "alpha"}
    for key, sub in npy.items():
        if key in frame:
            os.makedirs(os.path.join(savedir, sub), exist_ok=True)
            np.save(os.path.join(savedir, sub, f"{idx:06d}.npy"), frame[key])
    os.makedirs(os.path.join(savedir, "pose"), exist_ok=True)
    pose4 = np.concatenate(
        [np.asarray(pose)[:3, :4], np.array([[0.0, 0.0, 0.0, 1.0]])], 0
    )
    np.savetxt(os.path.join(savedir, "pose", f"{idx:06d}.txt"), pose4)


def render_pose_list(
    poses,
    H: int,
    W: int,
    focal: float,
    near: float,
    far: float,
    coarse_fn: Callable,
    fine_fn: Optional[Callable],
    opts: RenderOptions,
    render_factor: int = 0,
    chunk: int = 32768,
    savedir: Optional[str] = None,
    key=None,
    dump_raw: bool = False,
    gt_imgs=None,
) -> Dict[str, np.ndarray]:
    """Render each pose; returns stacked maps {rgb, disp, acc, depth} as numpy.
    `dump_raw` extends the savedir tree with the reference's per-sample
    weight/z/alpha npy dumps (`run.py:1329-1343`)."""
    if render_factor and render_factor > 1:
        H, W, focal = H // render_factor, W // render_factor, focal / render_factor

    keep = ("rgb", "disp", "acc", "depth")
    if dump_raw:
        keep += ("weights", "z_vals", "alpha")
    render = jax.jit(
        lambda c2w: render_image(
            key, H, W, focal, c2w, near, far, coarse_fn, fine_fn, opts, chunk,
            keep=keep,
        )
    )

    outs: Dict[str, List[np.ndarray]] = {"rgb": [], "disp": [], "acc": [], "depth": []}
    for i, pose in enumerate(np.asarray(poses)):
        ret = render(jnp.asarray(pose[:3, :4]))
        frame = {k: np.asarray(v) for k, v in ret.items()}
        for k in outs:
            outs[k].append(frame[k])
        if savedir:
            gt = gt_imgs[i] if gt_imgs is not None else None
            save_frame_tree(savedir, i, frame, pose, gt)
    return {k: np.stack(v) for k, v in outs.items()}


def neighbor_view_indices(step: int, n_views: int, width: int = 4, stride: int = 2) -> np.ndarray:
    """Window of up to 5 training views around `step % n_views`
    (`run.py:1388-1391`: i-4, i-2, i, i+2, i+4 clipped to range)."""
    center = step % n_views
    idx = np.arange(center - width, center + width + 1, stride)
    return idx[(idx >= 0) & (idx < n_views)]


def generate_render_path(poses: np.ndarray, focal: float, n_views: int = 120,
                         n_rots: int = 2, z_factor: float = 0.1) -> np.ndarray:
    """Standalone spiral render-path generator around the average pose
    (`DS_NeRF/utils/generate_renderpath.py:33-51`). poses [N, 3, 4/5] -> [n_views, 3, 4]."""
    from mvip_tpu.data.llff import poses_avg, render_path_spiral

    if poses.shape[-1] == 4:  # pad an hwf column (poses_avg expects [N, 3, 5])
        hwf = np.zeros((len(poses), 3, 1), poses.dtype)
        poses = np.concatenate([poses[:, :3, :4], hwf], -1)
    c2w = poses_avg(poses)
    up = poses[:, :3, 1].sum(0)
    up = up / np.linalg.norm(up)
    rads = np.percentile(np.abs(poses[:, :3, 3]), 90, axis=0) * 1.1
    return np.asarray(
        render_path_spiral(c2w, up, rads, focal, zrate=z_factor, rots=n_rots,
                           N=n_views)
    )[:, :3, :4]
