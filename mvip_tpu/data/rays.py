"""Device-resident ray streams.

Capability parity with the reference's ray batcher (`DS_NeRF/run.py:614-744`,
`data.py:4-15`), which materializes per-pixel ray tensors for all train images
(`rays_rgb`, `rays_rgb_clf`, `rays_rgb_sds`, `rays_inp`, `rays_depth`) in fp16 host
memory and iterates them with a shuffling DataLoader.

TPU-first redesign: rays are *implicit*. We keep images/masks/depths/poses resident
in HBM plus small int32 index sets per stream, and regenerate rays from (view, pixel)
indices inside the jitted train step (`mvip_tpu.ops.rays.rays_at_coords` — a few
FLOPs vs. gigabytes of HBM traffic). Batches are drawn with `jax.random` on device:
no host loop, no StopIteration-reset idiom (`run.py:806-825`), no fp16 precision loss.

Streams:
  clf     — unmasked pixels with RGB targets (reference `rays_rgb_clf`, mask == 0)
  sds/inp — all pixels (implicit: uniform over N*H*W); `inp` targets the inpainted
            depth map. NOTE: the reference filters `rays_inp` with an index-misaligned
            mask (`run.py:712-713`, quirk §2.5 of SURVEY.md); we use the intended
            "all pixels" semantics of its depth-loss batch.
  masked  — per-view masked pixel coords, padded to a fixed P_max (reference renders
            *all* masked pixels of one random view per step, `run.py:869-886`)
  depth   — COLMAP sparse-depth rays with reprojection weights (`run.py:663-700`)
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np

from mvip_tpu.ops.rays import rays_at_coords  # noqa: F401  (used by train step)


class RayStreams(NamedTuple):
    # dense per-view data (host numpy here; moved to device by the trainer)
    images: np.ndarray            # [N, H, W, 3] float32
    masks: np.ndarray             # [N, H, W] float32 (1 = inpaint region)
    inpainted_depths: np.ndarray  # [N, H, W] float32
    poses: np.ndarray             # [N, 3, 4]
    # index sets (linear pixel ids: view * H * W + row * W + col)
    clf_idx: np.ndarray           # [M1] int32 — unmasked pixels
    masked_coords: np.ndarray     # [N, P_max, 2] int32 (x=col, y=row), padded
    masked_counts: np.ndarray     # [N] int32 — valid prefix length per view
    # masked pixel coords at the reduced SDS render resolution (H//f, W//f);
    # empty ([N, 0, 2]) when sds_render_factor == 1 (the reference-exact path)
    sds_coords: np.ndarray        # [N, P_s, 2] int32, padded
    sds_counts: np.ndarray        # [N] int32
    # sparse depth supervision (empty arrays when unavailable)
    depth_rays_o: np.ndarray      # [M3, 3]
    depth_rays_d: np.ndarray      # [M3, 3]
    depth_target: np.ndarray      # [M3]
    depth_weight: np.ndarray      # [M3]

    @property
    def n_views(self):
        return self.images.shape[0]

    @property
    def hw(self):
        return self.images.shape[1:3]


def build_ray_streams(
    images: np.ndarray,
    masks: np.ndarray,
    inpainted_depths: np.ndarray,
    poses: np.ndarray,
    focal: float,
    depth_gts: Optional[List[dict]] = None,
    max_masked_pixels: int = 0,
    filter_depth_by_mask: bool = True,
    sds_render_factor: int = 1,
) -> RayStreams:
    """Host-side (numpy) stream construction; all heavy math stays on device later.

    `depth_gts`: output of `load_colmap_depth` — keypoints landing in the masked
    region are dropped when `filter_depth_by_mask` (reference `run.py:705-713`).
    """
    N, H, W = images.shape[:3]
    assert masks.shape == (N, H, W) and poses.shape[0] == N

    unmasked = masks.reshape(N, -1) == 0            # [N, H*W]
    base = (np.arange(N, dtype=np.int64) * (H * W))[:, None]
    lin = base + np.arange(H * W, dtype=np.int64)[None]
    clf_idx = lin[unmasked].astype(np.int64)
    if clf_idx.max(initial=0) < np.iinfo(np.int32).max:
        clf_idx = clf_idx.astype(np.int32)

    counts = (masks.reshape(N, -1) == 1).sum(-1).astype(np.int32)
    p_max = int(max_masked_pixels or (counts.max() if N else 0))
    masked_coords = np.zeros((N, p_max, 2), np.int32)
    for v in range(N):
        rr, cc = np.nonzero(masks[v] == 1)
        k = min(len(rr), p_max)
        masked_coords[v, :k, 0] = cc[:k]  # x = col
        masked_coords[v, :k, 1] = rr[:k]  # y = row
        if k < p_max and k > 0:
            # pad with the last valid pixel so padded rays render harmlessly
            masked_coords[v, k:] = masked_coords[v, k - 1]
    counts = np.minimum(counts, p_max)

    # Reduced-resolution masked coords for the RGB-SDS render (config
    # `sds_render_factor`). The SDS consumer resizes its input to 512^2
    # regardless (`guidance/sds._prep_image_mask`), so rendering the masked
    # view at (H//f, W//f) cuts the step's dominant ray count ~f^2-fold with
    # near-identical SDS input — the same economy the reference itself applies
    # to its normal (factor 7) and collaborative (factor 8) SDS renders.
    # A low-res pixel is masked when ANY pixel of its f x f block is masked,
    # so the composite always covers the full inpaint region.
    f = max(int(sds_render_factor), 1)
    if f > 1:
        Hs, Ws = H // f, W // f
        blocks = masks[:, : Hs * f, : Ws * f].reshape(N, Hs, f, Ws, f)
        masks_s = (blocks == 1).any((2, 4))              # [N, Hs, Ws] bool
        counts_s = masks_s.reshape(N, -1).sum(-1).astype(np.int32)
        ps_max = int(counts_s.max() if N else 0)
        sds_coords = np.zeros((N, ps_max, 2), np.int32)
        for v in range(N):
            rr, cc = np.nonzero(masks_s[v])
            k = len(rr)
            sds_coords[v, :k, 0] = cc
            sds_coords[v, :k, 1] = rr
            if 0 < k < ps_max:
                sds_coords[v, k:] = sds_coords[v, k - 1]
        sds_counts = counts_s
    else:
        sds_coords = np.zeros((N, 0, 2), np.int32)
        sds_counts = np.zeros((N,), np.int32)

    if depth_gts:
        o_list, d_list, t_list, w_list = [], [], [], []
        for v, rec in enumerate(depth_gts):
            coord, depth, weight = rec["coord"], rec["depth"], rec["weight"]
            if filter_depth_by_mask:
                r = np.minimum(coord[:, 1].astype(int), H - 1)
                c = np.minimum(coord[:, 0].astype(int), W - 1)
                keep = masks[v, r, c] == 0
                coord, depth, weight = coord[keep], depth[keep], weight[keep]
            if len(coord) == 0:
                continue
            x, y = coord[:, 0], coord[:, 1]
            dirs = np.stack(
                [(x - W * 0.5) / focal, -(y - H * 0.5) / focal, -np.ones_like(x)], -1
            )
            rd = (dirs[..., None, :] * poses[v, :3, :3]).sum(-1)
            ro = np.broadcast_to(poses[v, :3, -1], rd.shape)
            o_list.append(ro)
            d_list.append(rd)
            t_list.append(depth)
            w_list.append(weight)
        depth_rays_o = np.concatenate(o_list).astype(np.float32)
        depth_rays_d = np.concatenate(d_list).astype(np.float32)
        depth_target = np.concatenate(t_list).astype(np.float32)
        depth_weight = np.concatenate(w_list).astype(np.float32)
    else:
        depth_rays_o = np.zeros((0, 3), np.float32)
        depth_rays_d = np.zeros((0, 3), np.float32)
        depth_target = np.zeros((0,), np.float32)
        depth_weight = np.zeros((0,), np.float32)

    return RayStreams(
        images=images.astype(np.float32),
        masks=masks.astype(np.float32),
        inpainted_depths=inpainted_depths.astype(np.float32),
        poses=poses.astype(np.float32),
        clf_idx=clf_idx,
        masked_coords=masked_coords,
        masked_counts=counts,
        sds_coords=sds_coords,
        sds_counts=sds_counts,
        depth_rays_o=depth_rays_o,
        depth_rays_d=depth_rays_d,
        depth_target=depth_target,
        depth_weight=depth_weight,
    )
