"""Single-chip fused training step: two Pallas megakernels per iteration.

The guidance-off training iteration (`train/step.py:base_losses`, mirroring
`run.py:996-1027`) renders up to three ray batches — unmasked-pixel RGB,
inpainted-depth disparity, COLMAP sparse depth — each through a coarse+fine
hierarchical render, then backprops three MSE terms. The XLA step materializes
every [R*S, 256] MLP activation in HBM for autodiff; the custom-VJP megakernel
(`ops/pallas_render_grad.py`) avoided that but ran each forward twice.

This step removes both costs: the batches CONCATENATE into one ray batch with
per-ray loss scales, and each model runs ONE `ops/pallas_train.py` kernel that
renders, forms the loss cotangents in-kernel, and backprops to parameter
gradients — coarse kernel -> fused inverse-CDF sampler -> fine kernel -> Adam.
jax.grad never runs: gradients come out of the kernels directly.

Scope: PE-MLP backbone, guidance off, sigma_loss off, single device (the
Pallas grid does not auto-partition under a mesh — multi-chip training uses
the XLA step). Loss values and gradients match `base_losses` + jax.grad for
identical batch/z/noise draws (tested); the RNG *stream* differs (keys are
split per-purpose here), so individual runs are not bit-identical to the XLA
step — both are faithful samplers of the same training distribution.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from mvip_tpu.models.nerf_mlp import NeRFMLPConfig
from mvip_tpu.ops.pallas_train import fused_train_render_grads
from mvip_tpu.ops.sampling import merge_z_vals, stratified_z_vals
from mvip_tpu.render.renderer import RenderOptions
from mvip_tpu.train.losses import mse2psnr
from mvip_tpu.train.state import TrainState
from mvip_tpu.train.step import (
    DeviceStreams,
    StepConfig,
    sample_clf_batch,
    sample_depth_batch,
    sample_inp_batch,
)


def fused_step_supported(scfg: StepConfig, ropts: RenderOptions,
                         backbone: str, mcfg=None,
                         n_devices: int = 0) -> bool:
    """The fused kernels cover the canonical guidance-off configs; anything
    else falls back to the XLA step. `n_devices` must be the mesh size the
    step will actually be built with (0 = all visible devices)."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
        n_dev = n_devices or len(jax.devices())
    except Exception:
        return False
    if backbone == "mlp":
        model_ok = mcfg is None or (
            getattr(mcfg, "multires", 0) > 0
            and getattr(mcfg, "multires_views", 0) > 0
        )  # the kernel's in-VMEM positional encoding assumes PE inputs
    elif backbone == "hashgrid_fused":
        # The three-kernel chain (ops/pallas_hash_train.py) is oracle-correct
        # but measured SLOWER than the XLA step with the transposed encode
        # custom-VJP (13.0k vs 14.8k rays/s, one v5e): XLA overlaps the tiny
        # MLP/composite/autodiff work with the encode kernels for free (stage
        # timing in BASELINE.md r2), while the chain pays an unoverlapped
        # kernel + layout glue. Keep the XLA step as the training default;
        # the chain stays available via make_fused_train_step(hcfg) directly.
        return False
    else:
        return False
    return (
        model_ok
        and on_tpu
        and scfg.n_rand % n_dev == 0
        and not scfg.sigma_loss
        and not ropts.ndc
        and ropts.use_viewdirs
        and not ropts.detach_weights  # kernel backprops rgb through weights
        and ropts.n_importance > 0
    )


def make_fused_train_step(
    scfg: StepConfig,
    ropts: RenderOptions,
    mcfg: NeRFMLPConfig,
    optimizer,
    block_rays: int = 32,
    interpret: bool = False,
    mesh=None,
    n_devices: int = 1,
    occ_cfg=None,
    compute_dtype: str = "float32",
):
    """Build the fused (state, streams, key[, occ_grid]) -> (state, metrics)
    step.

    `compute_dtype="bfloat16"` (PE-MLP backbone only) runs the megakernels'
    MLP matmuls on bf16 operands with f32 accumulation — see
    `ops/pallas_train.fused_train_render_grads`.

    With `occ_cfg` (an interval-mode `ops/occupancy.OccupancyConfig`) the
    step accepts a trailing `occ_grid` array and prunes BOTH stages' ladders
    before the megakernels via the phantom-sample last-width trick
    (`ops/occupancy.phantom_ladder` + `PHANTOM_NOISE` — the kernels stay
    untouched; the phantom's sigma and gradient are exactly zero). Calling
    without `occ_grid` traces the unpruned program (warmup phase).

    `mcfg` selects the backbone: a NeRFMLPConfig runs the PE-MLP megakernel
    (`ops/pallas_train.py`); a HashGridConfig runs the three-kernel hash-grid
    chain (`ops/pallas_hash_train.py`) — same loss surface either way.

    With `mesh` (a 1-D data mesh) and n_devices > 1, the kernels run
    per-device under `shard_map`: each device draws a distinct 1/n_devices
    slice of the global ray batch (the key is folded with the device index),
    loss scales carry the GLOBAL normalization, and gradients + loss sums
    all-reduce with `psum` over ICI — the Pallas equivalent of the XLA
    step's sharding-constraint data parallelism."""
    if isinstance(mcfg, NeRFMLPConfig):
        render_grads = (
            partial(fused_train_render_grads, compute_dtype=compute_dtype)
            if compute_dtype != "float32" else fused_train_render_grads
        )
    else:
        from mvip_tpu.ops.pallas_hash_train import hash_fused_render_grads

        render_grads = hash_fused_render_grads
    n_dev = max(n_devices, 1)
    if scfg.n_rand % n_dev:
        raise ValueError(f"n_rand={scfg.n_rand} not divisible by {n_dev} devices")
    n1g = scfg.n_rand
    n2g = scfg.n_rand if scfg.depth_loss else 0
    n3g = scfg.n_rand if scfg.colmap_depth else 0
    n1 = n1g // n_dev
    n2 = n2g // n_dev
    n3 = n3g // n_dev
    S = ropts.n_samples

    def _scales(w_d, n3, R):
        zeros1 = jnp.zeros((n1,), jnp.float32)
        # fine-model scales: img MSE on batch 1, depth_lambda * disp MSE on
        # batch 2, depth_lambda * (optionally reprojection-weighted) depth MSE
        # on batch 3 (`run.py:996-1027` weights). Normalization is GLOBAL
        # (n*g) so per-device loss sums psum to the global means.
        s_rgb = jnp.concatenate(
            [jnp.full((n1,), 1.0 / (n1g * 3)), jnp.zeros((n2 + n3,))]
        )
        s_disp = jnp.concatenate(
            [zeros1, jnp.full((n2,), scfg.depth_lambda / max(n2g, 1)),
             jnp.zeros((n3,))]
        )
        if n3:
            wd = w_d if scfg.weighted_loss else jnp.ones((n3,))
            s_depth = jnp.concatenate(
                [zeros1, jnp.zeros((n2,)), scfg.depth_lambda * wd / n3g]
            )
        else:
            s_depth = jnp.zeros((R,))
        return s_rgb, s_disp, s_depth

    if occ_cfg is not None and occ_cfg.mode != "interval":
        raise ValueError(
            "fused step occupancy pruning is interval-mode only (topk dists "
            "are not ladder diffs, so the phantom-sample trick cannot encode "
            "them — see ops/occupancy.phantom_ladder)"
        )

    def step_grads(params, streams: DeviceStreams, key, occ_grid=None):
        # batch 3 needs actual COLMAP depth data; like base_losses
        # (`train/step.py:176`), skip it when the stream is empty (shapes are
        # static under jit, so this is a trace-time branch)
        n3_eff = n3 if streams.depth_target.shape[0] > 0 else 0
        R = n1 + n2 + n3_eff
        k_clf, k_inp, k_dep, k_z0, k_n0, k_pdf, k_n1 = jax.random.split(key, 7)

        ro, rd, t_rgb1 = sample_clf_batch(
            k_clf, streams, n1, scfg.H, scfg.W, scfg.focal
        )
        parts_o, parts_d = [ro], [rd]
        t_disp = jnp.zeros((n1,))
        t_depth = jnp.zeros((R,))
        w_d = None  # noqa: n3_eff gates batch 3 below
        if n2:
            ro2, rd2, t_inp = sample_inp_batch(
                k_inp, streams, n2, scfg.H, scfg.W, scfg.focal
            )
            parts_o.append(ro2)
            parts_d.append(rd2)
            t_disp = jnp.concatenate([t_disp, t_inp])
        if n3_eff:
            ro3, rd3, t_d, w_d = sample_depth_batch(k_dep, streams, n3_eff)
            parts_o.append(ro3)
            parts_d.append(rd3)
            t_disp = jnp.concatenate([t_disp, jnp.zeros((n3_eff,))])
            t_depth = t_depth.at[n1 + n2:].set(t_d)
        ro = jnp.concatenate(parts_o)
        rd = jnp.concatenate(parts_d)
        t_rgb = jnp.concatenate([t_rgb1, jnp.zeros((n2 + n3_eff, 3))])

        s_rgb, s_disp, s_depth = _scales(w_d, n3_eff, R)
        # coarse model: only the img0 term (`run.py:1018`), still rendering
        # ALL rays — batches 2/3 need its weights for importance sampling
        s_rgb0 = jnp.where(
            jnp.arange(R) < n1, 0.0 if scfg.no_coarse else 1.0 / (n1g * 3), 0.0
        )
        zeros_s = jnp.zeros((R,))

        pruner = None
        if occ_cfg is not None and occ_grid is not None:
            from mvip_tpu.ops.occupancy import make_pruner, pruner_quantum

            # append=1 (the phantom sample); quantum is per-backbone — the
            # MLP megakernel cliffs at non-multiple-of-8 ladders, the hash
            # three-kernel chain doesn't (see ops/occupancy.pruner_quantum)
            pruner = make_pruner(occ_grid, occ_cfg, append=1,
                                 quantum=pruner_quantum(mcfg))

        def _pruned(z, k_noise):
            """Interval-occupancy pruning with the phantom-sample last-width
            trick — same recipe as `fused_train_hier_render`."""
            from mvip_tpu.ops.occupancy import PHANTOM_NOISE, phantom_ladder

            had = False
            if pruner is not None:
                z_p, d_p = pruner(ro, rd, z)
                z = z_p
                if d_p is not None:
                    z = phantom_ladder(z_p, d_p)
                    had = True
            Sz = z.shape[-1]
            noise = (
                jax.random.normal(k_noise, (R, Sz)) * ropts.raw_noise_std
                if ropts.raw_noise_std > 0 else jnp.zeros((R, Sz))
            )
            if had:
                noise = noise.at[:, -1].set(PHANTOM_NOISE)
            return z, noise, had

        z, noise0, ph0 = _pruned(
            stratified_z_vals(k_z0, R, S, scfg.near, scfg.far,
                              lindisp=ropts.lindisp, perturb=ropts.perturb),
            k_n0,
        )
        m0, g_coarse = render_grads(
            params["coarse"], mcfg, ro, rd, z, noise0,
            t_rgb, t_disp, t_depth, s_rgb0, zeros_s, zeros_s,
            white_bkgd=ropts.white_bkgd, block_rays=block_rays,
            interpret=interpret,
        )

        # importance PDF over the REAL samples only (the phantom's weight is
        # 0 but its huge midpoint would stretch the last CDF bin)
        z_r = z[:, :-1] if ph0 else z
        w_r = m0["weights"][:, :-1] if ph0 else m0["weights"]
        z_mid = 0.5 * (z_r[:, 1:] + z_r[:, :-1])
        if interpret:
            from mvip_tpu.ops.sampling import sample_pdf

            z_fine = sample_pdf(z_mid, w_r[:, 1:-1],
                                ropts.n_importance, key=k_pdf,
                                det=(ropts.perturb == 0.0))
        else:
            from mvip_tpu.ops.pallas_sampling import sample_pdf_pallas

            z_fine = sample_pdf_pallas(z_mid, w_r[:, 1:-1],
                                       ropts.n_importance, key=k_pdf,
                                       det=(ropts.perturb == 0.0))
        z_all, noise1, _ = _pruned(merge_z_vals(z_r, z_fine), k_n1)
        m1, g_fine = render_grads(
            params["fine"], mcfg, ro, rd, z_all, noise1,
            t_rgb, t_disp, t_depth, s_rgb, s_disp, s_depth,
            white_bkgd=ropts.white_bkgd, block_rays=block_rays,
            interpret=interpret,
        )

        img_loss = m1["sq_rgb"]                       # already mean (s=1/(n1*3))
        depth_loss = (
            m1["sq_disp"] / scfg.depth_lambda
            if (n2 and scfg.depth_lambda > 0) else jnp.zeros(())
        )
        loss = m1["sq_rgb"] + m1["sq_disp"] + m1["sq_depth"] + m0["sq_rgb"]
        metrics = {
            "loss": loss,
            "img_loss": img_loss,
            "depth_loss": depth_loss,
            "psnr": mse2psnr(img_loss),
        }
        return {"coarse": g_coarse, "fine": g_fine}, metrics

    if mesh is not None and n_dev > 1:
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map
            sm_kwargs = {"check_vma": False}
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
            sm_kwargs = {"check_rep": False}

        axis = mesh.axis_names[0]

        def sharded_grads(params, streams, key, *g):
            # distinct ray draws per device; grads/losses psum over ICI
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            grads, metrics = step_grads(params, streams, key,
                                        g[0] if g else None)
            grads = jax.lax.psum(grads, axis)
            metrics = jax.lax.psum(metrics, axis)
            metrics["psnr"] = mse2psnr(metrics["img_loss"])  # not summable
            return grads, metrics

        def grads_fn(params, streams, key, occ_grid=None):
            # the occ grid rides shard_map explicitly (replicated spec)
            # rather than via closure capture
            extra = () if occ_grid is None else (occ_grid,)
            return shard_map(
                sharded_grads, mesh=mesh,
                in_specs=(P(), P(), P()) + ((P(),) if occ_grid is not None
                                            else ()),
                out_specs=(P(), P()), **sm_kwargs,
            )(params, streams, key, *extra)
    else:
        grads_fn = step_grads

    def train_step(state: TrainState, streams: DeviceStreams, key,
                   occ_grid=None):
        grads, metrics = grads_fn(state.params, streams, key, occ_grid)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_fused_train_scan(
    scfg: StepConfig,
    ropts: RenderOptions,
    mcfg: NeRFMLPConfig,
    optimizer,
    n_inner: int = 10,
    block_rays: int = 32,
    interpret: bool = False,
    mesh=None,
    n_devices: int = 1,
    occ_cfg=None,
    compute_dtype: str = "float32",
):
    """Megastep variant: lax.scan of n_inner fused steps per dispatch."""
    step = make_fused_train_step(scfg, ropts, mcfg, optimizer,
                                 block_rays=block_rays, interpret=interpret,
                                 mesh=mesh, n_devices=n_devices,
                                 occ_cfg=occ_cfg, compute_dtype=compute_dtype)

    def train_scan(state: TrainState, streams: DeviceStreams, key,
                   occ_grid=None):
        def one_step(carry, k):
            st, strm = carry
            st, metrics = step(st, strm, k, occ_grid)
            return (st, strm), metrics

        keys = jax.random.split(key, n_inner)
        (state, _), metrics = jax.lax.scan(one_step, (state, streams), keys)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return jax.jit(train_scan, donate_argnums=(0,))
