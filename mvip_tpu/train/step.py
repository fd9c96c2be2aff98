"""The jitted training step.

Replaces the reference's per-iteration host loop (`DS_NeRF/run.py:798-1039`,
second stage): batch sampling, ray generation, coarse+fine rendering, loss
assembly, and the Adam update are ONE traced XLA program. Batches are drawn on
device from the implicit ray pools (`mvip_tpu.data.rays.RayStreams`).

Losses (guidance-off path, `run.py:996-1027`):
  img_loss    = mse(rgb_fine(clf batch), gt_rgb)        # unmasked pixels
  img_loss0   = mse(rgb_coarse(clf batch), gt_rgb)      # unless no_coarse
  depth_loss  = mse(disp(inp batch), inpainted_depth)   # * depth_lambda
  colmap depth / sigma losses optional (first-stage capability, `run.py:990-1001`)

Data parallelism: the step is jitted over a 1-D `Mesh('data')`; batch-dim
intermediates carry `with_sharding_constraint(P('data'))` so XLA shards the render
across chips and all-reduces gradients over ICI — the TPU-native replacement for
`nn.DataParallel` scatter/gather (`run.py:1491-1527`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from mvip_tpu.ops.rays import rays_at_view_coords
from mvip_tpu.render.renderer import RenderOptions, render_rays, sigma_loss
from mvip_tpu.train.losses import img2mse, mse2psnr, weighted_mse
from mvip_tpu.train.state import TrainState


class DeviceStreams(NamedTuple):
    """Device-side mirror of `mvip_tpu.data.rays.RayStreams` (jnp arrays)."""

    images: jnp.ndarray
    masks: jnp.ndarray
    inpainted_depths: jnp.ndarray
    poses: jnp.ndarray
    clf_idx: jnp.ndarray
    masked_coords: jnp.ndarray
    masked_counts: jnp.ndarray
    sds_coords: jnp.ndarray       # [N, 0, 2] unless sds_render_factor > 1
    sds_counts: jnp.ndarray
    depth_rays_o: jnp.ndarray
    depth_rays_d: jnp.ndarray
    depth_target: jnp.ndarray
    depth_weight: jnp.ndarray

    @classmethod
    def from_host(cls, streams, device=None) -> "DeviceStreams":
        arrs = []
        for f in cls._fields:
            host = getattr(streams, f)
            import numpy as _np

            if getattr(host, "dtype", None) == _np.int64 and (
                _np.abs(host).max(initial=0) >= _np.iinfo(_np.int32).max
            ):
                # jnp.asarray would silently truncate to int32 (x64 disabled)
                raise OverflowError(
                    f"stream {f!r} holds linear indices beyond int32 range; "
                    "scene too large for the implicit ray pool layout"
                )
            arrs.append(jnp.asarray(host))
        return cls(*arrs)


@dataclass(frozen=True)
class StepConfig:
    n_rand: int = 1024
    depth_lambda: float = 0.1
    depth_loss: bool = True
    no_coarse: bool = False
    colmap_depth: bool = False
    sigma_loss: bool = False
    sigma_lambda: float = 0.1
    weighted_loss: bool = False
    near: float = 0.0
    far: float = 1.0
    H: int = 0
    W: int = 0
    focal: float = 0.0


def _decode_linear(idx: jnp.ndarray, H: int, W: int):
    v, rem = jnp.divmod(idx, H * W)
    r, c = jnp.divmod(rem, W)
    return v, r, c


def _shard(x, spec=P("data")):
    """Constrain a batch-dim intermediate to the data mesh axis. No-op when (a)
    no mesh is in scope (single-device tests) or (b) tracing inside a shard_map
    body where the data axis is already Manual (the fused step,
    `train/fused_step.py`) — with_sharding_constraint would reject manual axes
    there."""
    try:
        from jax._src.mesh import get_abstract_mesh

        if "data" in getattr(get_abstract_mesh(), "manual_axes", ()):
            return x
    except Exception:
        pass  # private-API drift: fall through and let the constraint decide
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except Exception:  # no mesh in scope -> unconstrained
        return x


def sample_clf_batch(key, streams: DeviceStreams, n: int, H: int, W: int, focal):
    """Unmasked-pixel batch: rays + RGB targets (reference `batch_clf`)."""
    idx = jax.random.randint(key, (n,), 0, streams.clf_idx.shape[0])
    lin = streams.clf_idx[idx]
    v, r, c = _decode_linear(lin, H, W)
    coords = jnp.stack([c, r], -1).astype(jnp.float32)
    rays_o, rays_d = rays_at_view_coords(streams.poses, v, coords, H, W, focal)
    target = streams.images[v, r, c]
    return _shard(rays_o), _shard(rays_d), _shard(target)


def sample_inp_batch(key, streams: DeviceStreams, n: int, H: int, W: int, focal):
    """All-pixel batch targeting the inpainted depth map (reference `batch_inp`)."""
    n_total = streams.images.shape[0] * H * W
    lin = jax.random.randint(key, (n,), 0, n_total)
    v, r, c = _decode_linear(lin, H, W)
    coords = jnp.stack([c, r], -1).astype(jnp.float32)
    rays_o, rays_d = rays_at_view_coords(streams.poses, v, coords, H, W, focal)
    target = streams.inpainted_depths[v, r, c]
    return _shard(rays_o), _shard(rays_d), _shard(target)


def sample_depth_batch(key, streams: DeviceStreams, n: int):
    """COLMAP sparse-depth batch (reference `batch_depth`)."""
    idx = jax.random.randint(key, (n,), 0, streams.depth_target.shape[0])
    return (
        _shard(streams.depth_rays_o[idx]),
        _shard(streams.depth_rays_d[idx]),
        _shard(streams.depth_target[idx]),
        _shard(streams.depth_weight[idx]),
    )


def model_fns(params, coarse_apply, fine_apply):
    """Close coarse/fine apply functions over the current params."""
    coarse_fn = partial(coarse_apply, params["coarse"])
    fine_fn = (
        partial(fine_apply, params["fine"])
        if fine_apply is not None and params.get("fine") is not None
        else None
    )
    return coarse_fn, fine_fn


def base_losses(params, streams: DeviceStreams, key, scfg: StepConfig,
                ropts: RenderOptions, coarse_apply, fine_apply):
    """The guidance-off loss terms (`run.py:996-1027`), shared by the plain and
    MVIP (guidance-on) train steps. Returns (loss, metrics)."""
    k_clf, k_inp, k_dep, k_r1, k_r2, k_r3 = jax.random.split(key, 6)
    coarse_fn, fine_fn = model_fns(params, coarse_apply, fine_apply)

    ro, rd, target = sample_clf_batch(
        k_clf, streams, scfg.n_rand, scfg.H, scfg.W, scfg.focal
    )
    out = render_rays(
        k_r1, ro, rd, scfg.near, scfg.far, coarse_fn, fine_fn, ropts
    )
    img_loss = img2mse(out["rgb"], target)
    loss = img_loss
    if ropts.n_importance > 0 and not scfg.no_coarse:
        loss = loss + img2mse(out["rgb0"], target)

    depth_loss = jnp.zeros(())
    if scfg.depth_loss:
        ro_i, rd_i, target_inp = sample_inp_batch(
            k_inp, streams, scfg.n_rand, scfg.H, scfg.W, scfg.focal
        )
        out_inp = render_rays(
            k_r2, ro_i, rd_i, scfg.near, scfg.far, coarse_fn, fine_fn, ropts
        )
        depth_loss = img2mse(out_inp["disp"], target_inp)
        loss = loss + scfg.depth_lambda * depth_loss

    if scfg.colmap_depth and streams.depth_target.shape[0] > 0:
        ro_d, rd_d, t_d, w_d = sample_depth_batch(k_dep, streams, scfg.n_rand)
        if scfg.sigma_loss:
            sl = sigma_loss(
                k_r3, ro_d, rd_d,
                rd_d / jnp.linalg.norm(rd_d, axis=-1, keepdims=True),
                scfg.near, t_d, fine_fn or coarse_fn,
                ropts.n_samples, ropts.perturb, ropts.raw_noise_std,
            ).mean()
            loss = loss + scfg.sigma_lambda * sl
        else:
            out_d = render_rays(
                k_r3, ro_d, rd_d, scfg.near, scfg.far, coarse_fn, fine_fn, ropts
            )
            cd = (
                weighted_mse(out_d["depth"], t_d, w_d)
                if scfg.weighted_loss
                else img2mse(out_d["depth"], t_d)
            )
            loss = loss + scfg.depth_lambda * cd

    metrics = {
        "loss": loss,
        "img_loss": img_loss,
        "depth_loss": depth_loss,
        "psnr": mse2psnr(img_loss),
    }
    return loss, metrics


def _ropts_with_pruner(ropts: RenderOptions, occ_cfg, occ_grid):
    """Occupancy-on variant of the render options: close the sample pruner
    over the (traced) grid argument so refreshed grids never retrace."""
    import dataclasses

    from mvip_tpu.ops.occupancy import make_pruner

    return dataclasses.replace(ropts, pruner=make_pruner(occ_grid, occ_cfg))


def make_train_step(
    scfg: StepConfig,
    ropts: RenderOptions,
    coarse_apply: Callable,   # (params, pts, viewdirs) -> raw
    fine_apply: Optional[Callable],
    optimizer,
    guidance_grad_fn: Optional[Callable] = None,
    occ_cfg=None,
):
    """Build the jitted step: (state, streams, key) -> (state, metrics).

    With `occ_cfg` (ops/occupancy.OccupancyConfig) the signature gains a
    trailing `occ_grid` array and every render prunes its samples against it.
    """

    def loss_fn(params, streams: DeviceStreams, key, occ_grid=None):
        r = ropts if occ_grid is None else _ropts_with_pruner(ropts, occ_cfg, occ_grid)
        return base_losses(params, streams, key, scfg, r, coarse_apply, fine_apply)

    def train_step(state: TrainState, streams: DeviceStreams, key, occ_grid=None):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, streams, key, occ_grid
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    if occ_cfg is not None:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(
        lambda state, streams, key: train_step(state, streams, key),
        donate_argnums=(0,),
    )


def make_train_scan(
    scfg: StepConfig,
    ropts: RenderOptions,
    coarse_apply: Callable,
    fine_apply: Optional[Callable],
    optimizer,
    n_inner: int = 10,
    occ_cfg=None,
):
    """Megastep: `lax.scan` n_inner optimization steps inside ONE jitted call.

    TPU-native throughput trick with no reference analogue: the per-step host
    dispatch (and, on tunneled backends, its round-trip latency) amortizes over
    n_inner device-side steps. Returns (state, stacked_metrics_of_last_step).
    With `occ_cfg`, the occupancy grid rides the scan carry read-only (the
    refresh cadence lives at dispatch granularity in the loop).
    """

    def loss_fn(params, streams: DeviceStreams, key, occ_grid=None):
        r = ropts if occ_grid is None else _ropts_with_pruner(ropts, occ_cfg, occ_grid)
        return base_losses(params, streams, key, scfg, r, coarse_apply, fine_apply)

    def one_step(carry, key):
        state, streams, occ_grid = carry
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, streams, key, occ_grid
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(state.step + 1, params, opt_state), streams, occ_grid), metrics

    def train_scan(state: TrainState, streams: DeviceStreams, key, occ_grid=None):
        keys = jax.random.split(key, n_inner)
        (state, _, _), metrics = jax.lax.scan(
            one_step, (state, streams, occ_grid), keys
        )
        return state, jax.tree.map(lambda m: m[-1], metrics)

    if occ_cfg is not None:
        return jax.jit(train_scan, donate_argnums=(0,))
    return jax.jit(
        lambda state, streams, key: train_scan(state, streams, key),
        donate_argnums=(0,),
    )
