"""Occupancy-grid sample pruning (instant-NGP-style, TPU-first, opt-in).

The reference keeps vanilla NeRF's fixed 64+64 hierarchical sampling even on
its tcnn hash-grid backbone (`DS_NeRF/run.py:1703-1847`); the tcnn ecosystem's
usual companion — an EMA density grid that skips empty space (instant-ngp
Sec. 3.1 / `nerfacc`-style estimators) — is absent. This module adds it as an
opt-in accelerator (`--occ_grid`): same renderer, same losses, but each
stage's z-samples are compacted to the occupied subset before the (encode-
dominated) network query, cutting the per-step point load by the keep ratio.

TPU-first shape discipline: pruning never produces ragged arrays. Every ray
keeps exactly K = ceil(S * keep) samples, chosen as the occupied ones first
(in depth order) and padded with the unoccupied ones (also in depth order)
when fewer than K are occupied; a final in-register sort restores depth
monotonicity for compositing. Skipped samples would contribute alpha ~ 0
anyway wherever the grid is conservative, so the pruned composite converges
to the unpruned one as the grid tightens.

The grid itself is maintained the instant-ngp way — decay-all + max-update at
probed cells, probing random cells with jittered positions — as pure XLA
(gather for lookups, one scatter-max per refresh; no Pallas needed: the
lookup is ~200k gathers per step, three orders of magnitude below the hash-
encode load that justified the one-hot-matmul kernels).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class OccupancyConfig:
    """Knobs for the occupancy estimator (defaults follow instant-ngp).

    `bound`: half-extent of the grid AABB [-bound, bound]^3 (use the model's
    hash-grid bound so grid cells and encode inputs agree). `keep`: fraction
    of each stage's samples kept after pruning. `thresh`: density (post-relu
    sigma) above which a cell counts occupied — 0.01 is conservative for
    scenes in the reference's depth ranges; raise it to prune harder.
    """

    res: int = 128
    bound: float = 100.0
    keep: float = 0.5
    thresh: float = 1e-2
    decay: float = 0.95
    update_every: int = 16
    n_probe: int = 1 << 18
    warmup: int = 256
    # "interval": restrict each ray's ladder to its occupied span and
    # redistribute K samples there (finer-than-baseline sampling inside
    # content — instant-ngp's march-in-occupied-space, made static-shape).
    # "topk": keep K of the original samples, occupied first (exact stratum
    # quadrature, but caps per-ray resolution in content — measured 3 dB
    # held-out cost on content-dense scenes, BASELINE.md).
    mode: str = "interval"


def init_grid(cfg: OccupancyConfig) -> jnp.ndarray:
    """Flat [res^3] density EMA, zero-initialised (nothing occupied yet —
    callers must not prune until after `warmup` refreshes-worth of steps)."""
    return jnp.zeros((cfg.res**3,), jnp.float32)


def _cell_of(pts: jnp.ndarray, res: int, bound: float) -> jnp.ndarray:
    """[..., 3] world points -> [...] flat cell index (points outside the
    AABB clamp to boundary cells, which stay occupied only if content sits
    there — matches the encode path's own [0,1] clip)."""
    x01 = jnp.clip((pts + bound) / (2.0 * bound), 0.0, 1.0)
    ijk = jnp.minimum((x01 * res).astype(jnp.int32), res - 1)
    return (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]


def occ_lookup(grid: jnp.ndarray, pts: jnp.ndarray, cfg: OccupancyConfig):
    """[..., 3] points -> [...] EMA density at the containing cell."""
    return jnp.take(grid, _cell_of(pts, cfg.res, cfg.bound), axis=0)


@partial(jax.jit, static_argnames=("keep", "res"), donate_argnums=())
def _prune(grid, rays_o, rays_d, z_vals, *, keep: int, res: int,
           bound: float, thresh: float):
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    occ = jnp.take(grid, _cell_of(pts, res, bound), axis=0) >= thresh  # [R, S]
    # the final sample carries the ladder's 1e10 pseudo-width (it absorbs all
    # remaining transmittance for ANY positive sigma — discontinuous in
    # sigma), so always keep it: dropping it would shift acc/background for
    # rays whose tail cell is sub-threshold but not exactly empty
    occ = occ.at[..., -1].set(True)
    # Occupied samples first (depth order), then unoccupied (depth order):
    # span = far - near bounds every z, so adding it only to empty samples
    # ranks all occupied ones ahead without disturbing intra-group order.
    span = z_vals[..., -1:] - z_vals[..., :1] + 1.0
    score = jnp.where(occ, z_vals, z_vals + span)
    _, idx = jax.lax.top_k(-score, keep)                 # ascending score
    # each sample keeps its ORIGINAL stratum width so the composite quadrature
    # is invariant to compaction (see ops/compositing.render_weights)
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         jnp.full_like(z_vals[..., :1], 1e10)], -1,
    )
    kept_z = jnp.take_along_axis(z_vals, idx, axis=-1)
    kept_d = jnp.take_along_axis(dists, idx, axis=-1)
    # restore depth monotonicity (an empty-pad sample may precede an occupied
    # one in z even though it scored later)
    order = jnp.argsort(kept_z, axis=-1)
    return (jnp.take_along_axis(kept_z, order, axis=-1),
            jnp.take_along_axis(kept_d, order, axis=-1))


@partial(jax.jit, static_argnames=("keep", "res"), donate_argnums=())
def _prune_interval(grid, rays_o, rays_d, z_vals, *, keep: int, res: int,
                    bound: float, thresh: float):
    """Narrow each ray's ladder to its occupied span [first, last] occupied
    sample (one-stratum margin) and place `keep` samples there by fractional
    interpolation of the ORIGINAL ladder — so lindisp/perturbed spacings are
    respected and a fully-occupied ray degrades to plain K-subsampling.
    Rays with no occupied samples keep the full span (conservative)."""
    S = z_vals.shape[-1]
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    occ = jnp.take(grid, _cell_of(pts, res, bound), axis=0) >= thresh  # [R, S]
    any_occ = jnp.any(occ, -1)
    sidx = jnp.arange(S)
    ilo = jnp.min(jnp.where(occ, sidx, S - 1), -1)
    ihi = jnp.max(jnp.where(occ, sidx, 0), -1)
    ilo = jnp.where(any_occ, jnp.maximum(ilo - 1, 0), 0)
    ihi = jnp.where(any_occ, jnp.minimum(ihi + 1, S - 1), S - 1)
    frac = jnp.linspace(0.0, 1.0, keep)[None, :]                      # [1, K]
    pos = ilo[:, None] + (ihi - ilo)[:, None].astype(z_vals.dtype) * frac
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, S - 2)
    t = pos - i0
    z0 = jnp.take_along_axis(z_vals, i0, axis=-1)
    z1 = jnp.take_along_axis(z_vals, i0 + 1, axis=-1)
    zk = z0 + (z1 - z0) * t
    d = zk[..., 1:] - zk[..., :-1]
    # the reference ladder gives its LAST sample a 1e10 pseudo-width (absorbs
    # remaining transmittance); keep that only when the narrowed interval
    # still reaches the ladder end, else close with the local stratum width
    last = jnp.where(ihi[:, None] >= S - 1, 1e10, d[..., -1:])
    return zk, jnp.concatenate([d, last], -1)


# Noise value that forces a sample's post-relu sigma to zero inside the
# render kernels (raw sigma magnitudes are O(10)): relu(sigma - 1e9) == 0, so
# alpha == 0 exactly and the sample contributes nothing forward or backward.
PHANTOM_NOISE = -1e9


def phantom_ladder(z_p: jnp.ndarray, d_p: jnp.ndarray) -> jnp.ndarray:
    """Encode a pruned ladder's custom last-stratum width into the ladder
    itself, for renderers that derive dists from z-diffs with a hardcoded
    1e10 tail (the fused Pallas kernels, `pallas_train.composite_fwd`).

    Interval-mode pruned dists are exactly [diff(z_p), last_width], so
    appending ONE phantom sample at `z_p[-1] + last_width` makes the kernel's
    internal diffs reproduce them bit-for-bit — provided the caller forces
    the phantom sample's sigma to zero via its noise slot (`PHANTOM_NOISE`),
    which also zeroes its gradient (relu' == 0). Top-k-mode dists are NOT
    ladder diffs (kept samples keep their original stratum widths), so this
    trick is interval-only."""
    return jnp.concatenate([z_p, z_p[..., -1:] + d_p[..., -1:]], -1)


def pruner_quantum(model_cfg) -> int:
    """Ladder-length quantum for `make_pruner` by backbone config.

    The Mosaic scheduling cliff (13.7-22x at ladder lengths that aren't
    multiples of 8, BASELINE.md) lives in the fused PE-MLP kernels
    (`ops/pallas_train.py`, `ops/pallas_render_grad.py`) — those need
    quantum=8. The hash-grid kernels measured NO cliff at misaligned K+1
    (config-5 ran a clean 2.0x at keep=0.5 with K+1=33/49), so rounding up
    would only add ~19% samples: quantum=1, fewer samples wins. The ONE
    place that decides this for every fused caller (mvip_step guidance
    renders, both quantum sites; fused_step plain fits)."""
    from mvip_tpu.models.nerf_mlp import NeRFMLPConfig

    return 8 if isinstance(model_cfg, NeRFMLPConfig) else 1


def make_pruner(grid: jnp.ndarray, cfg: OccupancyConfig,
                append: int = 0, quantum: int = 1) -> Callable:
    """Returns pruner(rays_o, rays_d, z_vals) -> (z [R, K], dists [R, K]) —
    compacted z-samples plus per-sample widths (K = ceil(S * cfg.keep),
    static per input shape). Plugs into `RenderOptions.pruner`.

    `append`/`quantum`: kernel-shape alignment for the fused-Pallas callers —
    K is rounded UP (never down: extra samples only help quality) so that
    K + append is a multiple of `quantum`. The fused train/render kernels hit
    a Mosaic scheduling cliff at ladder lengths that aren't multiples of 8
    (measured 13.7x at S=33 vs S=32 and 22x at S=49 vs S=48 on one v5e,
    BASELINE.md); fused callers pass append=1 (the phantom sample,
    `phantom_ladder`) and quantum=8. XLA consumers handle any K and use the
    defaults."""

    if cfg.mode not in ("interval", "topk"):
        raise ValueError(f"unknown occupancy mode {cfg.mode!r} "
                         "(expected 'interval' or 'topk')")

    def pruner(rays_o, rays_d, z_vals):
        import math

        S = z_vals.shape[-1]
        keep = max(4, min(S, math.ceil(S * cfg.keep)))
        if quantum > 1:
            keep = max(
                keep, -(-(keep + append) // quantum) * quantum - append
            )
        if keep >= S:
            return z_vals, None
        fn = _prune_interval if cfg.mode == "interval" else _prune
        return fn(grid, rays_o, rays_d, z_vals, keep=keep, res=cfg.res,
                  bound=cfg.bound, thresh=cfg.thresh)

    return pruner


def update_grid(grid: jnp.ndarray, sigma_fn: Callable, key: jax.Array,
                cfg: OccupancyConfig) -> jnp.ndarray:
    """One instant-ngp-style refresh: decay every cell, then max the current
    density into `n_probe` uniformly-drawn cells at jittered positions.

    `sigma_fn(pts [M, 3]) -> [M]` post-activation density (the same quantity
    the compositor exponentiates). Pure XLA: one gatherless query batch + one
    scatter-max.
    """
    k_cell, k_jit = jax.random.split(key)
    n_cells = cfg.res**3
    idx = jax.random.randint(k_cell, (cfg.n_probe,), 0, n_cells)
    k = idx % cfg.res
    j = (idx // cfg.res) % cfg.res
    i = idx // (cfg.res * cfg.res)
    ijk = jnp.stack([i, j, k], -1).astype(jnp.float32)
    u = jax.random.uniform(k_jit, (cfg.n_probe, 3))
    x01 = (ijk + u) / cfg.res
    pts = x01 * (2.0 * cfg.bound) - cfg.bound
    sigma = sigma_fn(pts)
    decayed = grid * cfg.decay
    return decayed.at[idx].max(sigma.astype(grid.dtype))


def dense_refresh(grid: jnp.ndarray, sigma_fn: Callable, key: jax.Array,
                  cfg: OccupancyConfig, passes: int = 16) -> jnp.ndarray:
    """Cover the whole grid quickly (eval from a checkpoint, resume): `passes`
    sequential probe rounds. Coverage = 1 - (1 - n_probe/res^3)^passes: the
    defaults (n_probe=2^18, res=128, 16 passes) directly probe ~88% of cells;
    the rest stay at their decayed zero init (conservatively unoccupied only
    where nothing was seen)."""
    for p in range(passes):
        grid = update_grid(grid, sigma_fn, jax.random.fold_in(key, p), cfg)
    return grid


def sigma_fn_from_apply(apply_fn, params) -> Callable:
    """Adapt a backbone apply (params, pts, viewdirs) -> raw[..., 4] into the
    density query `update_grid` wants (relu(raw sigma), unit +z viewdirs for
    backbones that require directions — sigma heads never read them)."""

    def sigma_fn(pts):
        dirs = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], pts.dtype), pts.shape
        )
        raw = apply_fn(params, pts[:, None, :], dirs)
        return jax.nn.relu(raw[..., 0, 3])

    return sigma_fn
