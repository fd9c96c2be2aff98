"""The full MVIP-NeRF (second-stage) train step: NeRF losses + SDS guidance.

Parity target: the guidance-on iteration body (`DS_NeRF/run.py:862-1031`):
  1. pick a random train view, render ALL its masked pixels (`run.py:869-886,919`)
  2. composite the full image: GT pixels outside the mask, rendered pixels
     inside (`run.py:923-931`) -> RGB SDS (`nerf/utils.py:287-290`)
  3. optionally render the view downsampled by `normalmap_render_factor`,
     back-project depth -> 31x31 plane-fit normal map -> normal SDS
     (`run.py:948-965`, `nerf/utils.py:298-302`)
  4. optionally render <=5 neighboring views (window +-4 step 2 around
     `i % n_views`) -> collaborative SDS (`run.py:968-975,1365-1401`)
  5. unmasked-pixel MSE + inpainted-depth disparity MSE (base losses)
  6. total = base + sds_loss_weight * guidance; Adam step (`run.py:996-1031`)

TPU-first: ALL of it — three renders, VAE encodes, UNet CFG passes, the SDS
custom-VJP, and the optimizer update — is ONE jitted XLA program. The training
iteration `i` is a traced scalar (timestep annealing, neighbor-window position,
normal-start gating via `jnp.where`), so a single compilation serves the whole
run. Full-view renders are `lax.map`-chunked with `jax.checkpoint` (remat) so
the backward pass never materializes all [P, 128, W] activations.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from mvip_tpu.guidance.sds import (
    GuidanceModels,
    SDSConfig,
    sds_colla_step,
    sds_normal_step,
    sds_rgb_step,
)
from mvip_tpu.ops.normals import depth_to_normal_map
from mvip_tpu.ops.rays import rays_at_view_coords, rays_for_pose
from mvip_tpu.render.renderer import RenderOptions, render_rays
from mvip_tpu.train.state import TrainState
from mvip_tpu.train.step import DeviceStreams, StepConfig, base_losses


@dataclass(frozen=True)
class MVIPConfig:
    """Guidance wiring for the train step (flags from `config_1.txt:48-61`)."""

    sds_loss_weight: float = 1e-4
    is_rgb_guidance: bool = True
    is_normal_guidance: bool = False
    normal_start: int = 500
    normalmap_render_factor: int = 7
    normal_k: int = 31              # plane-fit neighborhood (`run.py:957`)
    is_colla_guidance: bool = False
    colla_n_views: int = 5          # window +-4 step 2 (`run.py:1388-1391`)
    colla_window_step: int = 2
    colla_render_factor: int = 8
    render_chunk: int = 8192        # masked-pixel render chunk (remat'd)
    # >1: render the RGB-SDS masked view at (H//f, W//f) using the
    # block-reduced coords in `streams.sds_coords` and composite into the
    # resized GT. The SDS consumer resizes to 512^2 regardless
    # (`sd_utils.py:282-284`), so this cuts the step's dominant ray count
    # ~f^2-fold — the economy the reference already applies to its normal
    # (factor 7) and collaborative (factor 8) renders. 1 = reference-exact.
    sds_render_factor: int = 1
    # True: when BOTH normal and colla guidance are on, render the normal
    # view's depth and the Nv colla neighbor views in one concatenated
    # dispatch instead of two (config.py `fuse_guidance_renders`).
    fuse_guidance_renders: bool = False
    # >0: occupancy keep rate for the guidance renders only (base losses keep
    # occ_cfg.keep). See config.py `occ_keep_guidance` for the rationale.
    occ_keep_guidance: float = 0.0


def composite_masked_render(gt, coords, count, rgb):
    """GT image with rendered RGB scattered into the first `count` mask coords.

    Parity: `DS_NeRF/run.py:923-931` (rendered pixels inside the mask, GT
    outside). `coords` is [P_max, 2] (x=col, y=row) padded to fixed shape;
    slots >= `count` must NOT scatter — a view with zero masked pixels keeps
    the all-zeros pad, which would otherwise write a garbage render into
    pixel (0,0). Invalid slots are sent out of bounds and dropped by XLA.
    """
    H, W = gt.shape[:2]
    valid = jnp.arange(coords.shape[0]) < count
    cc = jnp.where(valid[:, None], coords, jnp.array([W, H], jnp.int32))
    return gt.at[cc[:, 1], cc[:, 0]].set(rgb, mode="drop")


def _render_chunked_remat(key, rays_o, rays_d, near, far, coarse_fn, fine_fn,
                          ropts, chunk: int, keep=("rgb", "disp", "depth")):
    """Fixed-size lax.map chunks, each rematerialized: O(chunk) backward memory."""
    n = rays_o.shape[0]
    n_chunks = max(1, -(-n // chunk))
    pad = n_chunks * chunk - n
    ro = jnp.concatenate([rays_o, jnp.broadcast_to(rays_o[-1:], (pad, 3))])
    rd = jnp.concatenate([rays_d, jnp.broadcast_to(rays_d[-1:], (pad, 3))])
    ro = ro.reshape(n_chunks, chunk, 3)
    rd = rd.reshape(n_chunks, chunk, 3)
    keys = jax.random.split(key, n_chunks)

    @jax.checkpoint
    def body(args):
        k, o, d = args
        ret = render_rays(k, o, d, near, far, coarse_fn, fine_fn, ropts)
        return {kk: ret[kk] for kk in keep}

    outs = jax.lax.map(body, (keys, ro, rd))
    return {k: v.reshape(n_chunks * chunk, *v.shape[2:])[:n] for k, v in outs.items()}


def fused_guidance_supported(ropts: RenderOptions, backbone: str,
                             model_cfg=None) -> bool:
    """Whether the guidance-loss renders can run on the Pallas megakernel path
    (`ops/pallas_render_grad.fused_train_hier_render` for the PE-MLP,
    `ops/pallas_hash_render.hash_train_hier_render` for the hash grid) instead
    of the remat-chunked XLA renderer. Mirrors
    `train/fused_step.fused_step_supported` minus the batch-shape conditions
    (guidance renders are full views)."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    if backbone == "mlp":
        model_ok = model_cfg is None or (
            getattr(model_cfg, "multires", 0) > 0
            and getattr(model_cfg, "multires_views", 0) > 0
        )
    elif backbone == "hashgrid_fused":
        from mvip_tpu.ops.pallas_hashgrid_t import MAX_FUSED_LOG2_T

        model_ok = model_cfg is not None and (
            model_cfg.log2_table_size <= MAX_FUSED_LOG2_T
            and 128 % model_cfg.n_features == 0
        )
    else:
        return False
    return (
        model_ok
        and on_tpu
        and not ropts.ndc
        and ropts.use_viewdirs
        and not ropts.detach_weights
        and ropts.n_importance > 0
    )


def make_mvip_train_step(
    scfg: StepConfig,
    ropts: RenderOptions,
    coarse_apply: Callable,
    fine_apply: Optional[Callable],
    optimizer,
    mcfg: MVIPConfig,
    gm: GuidanceModels,
    sds_rgb_cfg: SDSConfig,
    sds_normal_cfg: SDSConfig,
    sds_colla_cfg: SDSConfig,
    text_pair_rgb: jnp.ndarray,      # [2, T, C] = [uncond | cond]
    text_pair_normal: jnp.ndarray,
    fused_mlp_cfg=None,              # NeRFMLPConfig | HashGridConfig =>
                                     # guidance renders run on the Pallas
                                     # megakernels (VERDICT r1 #3)
    mesh=None,                       # 1-D data mesh with size > 1 => fused
                                     # guidance renders shard the ray axis
                                     # via shard_map (grads psum over ICI)
    occ_cfg=None,                    # OccupancyConfig => interval-occupancy
                                     # pruning of every render in the step
                                     # (guidance + base losses); the returned
                                     # step then takes a 5th `occ_grid` arg
                                     # (None during warmup = unpruned trace)
    interpret: bool = False,         # CPU interpret mode for the fused path
    n_inner: int = 1,                # >1: lax.scan this many MVIP steps per
                                     # dispatch (guidance megastep)
):
    """Build the jitted MVIP step: (state, streams, key, i) -> (state, metrics).

    With n_inner > 1 the returned callable runs n_inner optimizer steps per
    dispatch (i is the FIRST inner step's index) and reports the last inner
    step's metrics, mirroring `step.make_train_scan`."""
    H, W, focal = scfg.H, scfg.W, scfg.focal
    n_imp = ropts.n_importance

    # Guidance weights enter the jitted program as ARGUMENTS, never as
    # closure captures: closing over `gm` would bake the UNet/VAE params
    # into the lowered module as literal constants — invisible at test
    # scale, but at real SD-1.5 scale it duplicates 3.6 GB of HBM (params
    # live once as arrays and again inside the executable) and bloats the
    # serialized program. Only the array halves ride the argument list;
    # the static halves (configs, step bounds) stay closure-bound and the
    # NamedTuple is rebuilt inside the trace.
    # Device-pin the bundle ONCE: checkpoint-loaded guidance weights arrive
    # as host numpy trees (guidance/weights.load_sd_guidance), and numpy
    # arguments re-transfer on EVERY dispatch — at real SD scale that ships
    # 3.6 GB through the tunnel per step (measured r4: the weights-day
    # rehearsal crawled at >30 s/step until this pin). jnp.asarray is a
    # no-op for arrays already on device (sd_size=real init path).
    _gm_arrays = jax.tree.map(
        jnp.asarray,
        (gm.unet_params, gm.vae_params, gm.alphas_cumprod,
         text_pair_rgb, text_pair_normal),
    )
    _gm_static = (gm.unet_cfg, gm.vae_cfg, gm.min_step, gm.max_step)
    del gm, text_pair_rgb, text_pair_normal  # nothing below may capture them

    def _rebuild_gm(gm_arr):
        unet_p, vae_p, acp, pair_rgb, pair_nrm = gm_arr
        unet_cfg, vae_cfg, min_step, max_step = _gm_static
        return (
            GuidanceModels(unet_p, vae_p, unet_cfg, vae_cfg, acp,
                           min_step, max_step),
            pair_rgb,
            pair_nrm,
        )

    def guidance_losses(params, streams: DeviceStreams, key, i, occ_grid,
                        gm_arr):
        gm, text_pair_rgb, text_pair_normal = _rebuild_gm(gm_arr)
        from mvip_tpu.train.step import model_fns

        coarse_fn, fine_fn = model_fns(params, coarse_apply, fine_apply)

        # guidance renders may prune harder than the base losses (config.py
        # `occ_keep_guidance`); occ_cfg_g is what EVERY pruner below is built
        # from, so the shard_map slices agree with the single-device path
        occ_cfg_g = occ_cfg
        if occ_cfg is not None and mcfg.occ_keep_guidance > 0.0:
            import dataclasses as _dc

            occ_cfg_g = _dc.replace(occ_cfg, keep=mcfg.occ_keep_guidance)

        pruner = None
        if occ_cfg is not None and occ_grid is not None:
            from mvip_tpu.ops.occupancy import make_pruner

            # fused renders append a phantom sample; the quantum is
            # per-backbone (see ops/occupancy.pruner_quantum: MLP kernels
            # cliff at non-multiple-of-8 ladders, hash kernels don't). The
            # XLA chunked path handles any K.
            if fused_mlp_cfg is not None:
                from mvip_tpu.ops.occupancy import pruner_quantum

                q = pruner_quantum(fused_mlp_cfg)
                pruner = make_pruner(occ_grid, occ_cfg_g, append=1, quantum=q)
            else:
                pruner = make_pruner(occ_grid, occ_cfg_g)

        if fused_mlp_cfg is not None:
            from mvip_tpu.models.nerf_mlp import NeRFMLPConfig

            if isinstance(fused_mlp_cfg, NeRFMLPConfig):
                from mvip_tpu.ops.pallas_render_grad import (
                    fused_train_hier_render as hier_render,
                )
            else:
                from mvip_tpu.ops.pallas_hash_render import (
                    hash_train_hier_render as hier_render,
                )

            def _hier(p, kk, ro, rd, pr=None):
                pf = p["fine"] if p.get("fine") else p["coarse"]
                return hier_render(
                    kk, p["coarse"], pf, fused_mlp_cfg, ro, rd,
                    scfg.near, scfg.far, ropts.n_samples, ropts.n_importance,
                    perturb=ropts.perturb, raw_noise_std=ropts.raw_noise_std,
                    lindisp=ropts.lindisp, white_bkgd=ropts.white_bkgd,
                    interpret=interpret, pruner=pr,
                )

            if mesh is not None and mesh.size > 1:
                # Multi-chip fused guidance renders (ROADMAP r2 #5): each
                # device renders a 1/n_devices ray slice on the Pallas
                # kernels (the Pallas grid does not auto-partition under
                # GSPMD, so manual shard_map is required); shard_map's
                # transpose psums the replicated-params cotangent over ICI
                # — the same data-parallel gradient the XLA fallback gets
                # from sharding constraints. The SDS UNet/VAE pass stays
                # replicated (it consumes the all-gathered composite).
                from jax.sharding import PartitionSpec as P

                try:
                    from jax import shard_map

                    sm_kwargs = {"check_vma": False}
                except ImportError:  # older jax
                    from jax.experimental.shard_map import shard_map

                    sm_kwargs = {"check_rep": False}
                axis = mesh.axis_names[0]
                n_dev = mesh.size

                def guided_render(kk, ro, rd, keep):
                    n = ro.shape[0]
                    n_pad = -(-n // n_dev) * n_dev
                    if n_pad > n:
                        pad = n_pad - n
                        ro = jnp.concatenate(
                            [ro, jnp.broadcast_to(ro[-1:], (pad, 3))]
                        )
                        rd = jnp.concatenate(
                            [rd, jnp.broadcast_to(rd[-1:], (pad, 3))]
                        )

                    # the occ grid rides shard_map explicitly (replicated
                    # spec) rather than via closure capture; the per-shard
                    # pruner is rebuilt from the sliced-in grid
                    extra = () if pruner is None else (occ_grid,)

                    def slice_render(p, k, o, d, *g):
                        # distinct stochastic draws per device slice
                        k = jax.random.fold_in(k, jax.lax.axis_index(axis))
                        pr = None
                        if g:
                            from mvip_tpu.ops.occupancy import make_pruner

                            pr = make_pruner(g[0], occ_cfg_g, append=1,
                                             quantum=q)
                        out = _hier(p, k, o, d, pr)
                        return {kk2: out[kk2] for kk2 in keep}

                    out = shard_map(
                        slice_render, mesh=mesh,
                        in_specs=(P(), P(), P(axis), P(axis))
                        + ((P(),) if pruner is not None else ()),
                        out_specs=P(axis), **sm_kwargs,
                    )(params, kk, ro, rd, *extra)
                    return {k2: v[:n] for k2, v in out.items()}
            else:
                def guided_render(kk, ro, rd, keep):
                    out = _hier(params, kk, ro, rd, pruner)
                    return {k: out[k] for k in keep}
        else:
            import dataclasses as _dc

            ropts_g = (
                ropts if pruner is None else _dc.replace(ropts, pruner=pruner)
            )

            def guided_render(kk, ro, rd, keep):
                return _render_chunked_remat(
                    kk, ro, rd, scfg.near, scfg.far, coarse_fn, fine_fn,
                    ropts_g, mcfg.render_chunk, keep,
                )
        k_view, k_r, k_sds, k_n, k_rn, k_c, k_rc = jax.random.split(key, 7)
        n_views = streams.images.shape[0]
        if streams.masked_coords.shape[1] == 0 and (
            mcfg.is_rgb_guidance or mcfg.is_colla_guidance
        ):
            raise ValueError(
                "SDS guidance requires inpainting masks, but the dataset has "
                "no masked pixels (masked_coords is empty)"
            )
        v = jax.random.randint(k_view, (), 0, n_views)

        sds_total = jnp.zeros(())
        metrics: Dict[str, jnp.ndarray] = {}

        # --- 1-2: masked-pixel render + composite + RGB SDS ------------------
        if mcfg.is_rgb_guidance:
            fs = mcfg.sds_render_factor
            if fs > 1:
                # reduced-res path: render the (block-reduced) masked coords
                # at (H//fs, W//fs) and composite into the resized GT
                Hs, Ws = H // fs, W // fs
                coords = streams.sds_coords[v].astype(jnp.float32)   # [Ps, 2]
                vv = jnp.full((coords.shape[0],), v)
                ro, rd = rays_at_view_coords(
                    streams.poses, vv, coords, Hs, Ws, focal / fs
                )
                ret = guided_render(k_r, ro, rd, ("rgb",))
                gt = jax.image.resize(streams.images[v], (Hs, Ws, 3), "linear")
                combined = composite_masked_render(
                    gt, streams.sds_coords[v], streams.sds_counts[v],
                    ret["rgb"],
                )
            else:
                coords = streams.masked_coords[v].astype(jnp.float32)  # [P, 2]
                vv = jnp.full((coords.shape[0],), v)
                ro, rd = rays_at_view_coords(
                    streams.poses, vv, coords, H, W, focal
                )
                ret = guided_render(k_r, ro, rd, ("rgb",))
                combined = composite_masked_render(
                    streams.images[v], streams.masked_coords[v],
                    streams.masked_counts[v], ret["rgb"],
                )
            # full-res mask either way: sds resizes image and mask to its
            # working resolution independently (`_prep_image_mask`)
            mask_img = streams.masks[v][..., None]                   # [H, W, 1]
            sds_rgb, rgb_gmag = sds_rgb_step(
                k_sds, gm, sds_rgb_cfg, i, combined[None], mask_img[None],
                text_pair_rgb, return_aux=True,
            )
            sds_total = sds_total + sds_rgb
            metrics["sds_rgb"] = rgb_gmag  # mean |grad| — the meaningful signal

        # ray grids for phases 3 (normal view) and 4 (colla neighbors) are
        # built up front so the fused-dispatch path can concatenate them
        if mcfg.is_normal_guidance:
            f = mcfg.normalmap_render_factor
            Hn, Wn = H // f, W // f
            ro_n, rd_n = rays_for_pose(Hn, Wn, focal / f, streams.poses[v])
            ro_n, rd_n = ro_n.reshape(-1, 3), rd_n.reshape(-1, 3)
        if mcfg.is_colla_guidance:
            fc = mcfg.colla_render_factor
            Hc, Wc = H // fc, W // fc
            half = mcfg.colla_n_views // 2
            offs = (jnp.arange(mcfg.colla_n_views) - half) * mcfg.colla_window_step
            base = jnp.mod(i, n_views)
            vids = jnp.clip(base + offs, 0, n_views - 1)             # [Nv]

            # ONE batched render for all neighbor views: each view is only
            # (H/f)x(W/f) ~ a few thousand rays, far below chip saturation —
            # flattening the Nv ray grids into a single dispatch keeps the
            # renderer at its large-batch rate instead of Nv small launches
            # (the reference loops Python-side per view, `run.py:1365-1401`)
            def rays_one(vid):
                ro, rd = rays_for_pose(Hc, Wc, focal / fc, streams.poses[vid])
                return ro.reshape(-1, 3), rd.reshape(-1, 3)

            ros, rds = jax.vmap(rays_one)(vids)                  # [Nv, R, 3]
            ro_c, rd_c = ros.reshape(-1, 3), rds.reshape(-1, 3)

        depth_n = rgbs_c = None
        if (mcfg.fuse_guidance_renders and mcfg.is_normal_guidance
                and mcfg.is_colla_guidance):
            # fused dispatch: both grids ride one render (phases 3+4 are
            # each far below chip fill; see MVIPConfig.fuse_guidance_renders)
            n_n = ro_n.shape[0]
            ret_nc = guided_render(
                k_rn, jnp.concatenate([ro_n, ro_c]),
                jnp.concatenate([rd_n, rd_c]), ("rgb", "depth"),
            )
            depth_n = ret_nc["depth"][:n_n].reshape(Hn, Wn)
            rgbs_c = ret_nc["rgb"][n_n:].reshape(mcfg.colla_n_views, Hc, Wc, 3)

        # --- 3: normal-map SDS -------------------------------------------------
        if mcfg.is_normal_guidance:
            if depth_n is None:
                ret_n = guided_render(k_rn, ro_n, rd_n, ("depth",))
                depth_n = ret_n["depth"].reshape(Hn, Wn)
            normal_map = depth_to_normal_map(
                depth_n, focal / f, Wn / 2.0, Hn / 2.0, k=mcfg.normal_k
            )
            mask_n = jax.image.resize(
                streams.masks[v][..., None], (Hn, Wn, 1), "nearest"
            )
            sds_n, n_gmag = sds_normal_step(
                k_n, gm, sds_normal_cfg, i, normal_map[None], mask_n[None],
                text_pair_normal, normal_start=mcfg.normal_start,
                return_aux=True,
            )
            # reference gates on i > normal_start (`nerf/utils.py:298`)
            gate = (i > mcfg.normal_start).astype(jnp.float32)
            sds_total = sds_total + gate * sds_n
            metrics["sds_normal"] = gate * n_gmag

        # --- 4: collaborative multi-view SDS -----------------------------------
        if mcfg.is_colla_guidance:
            if rgbs_c is None:
                ret_c = guided_render(k_rc, ro_c, rd_c, ("rgb",))
                rgbs_c = ret_c["rgb"].reshape(mcfg.colla_n_views, Hc, Wc, 3)
            rgbs = rgbs_c
            masks_c = jax.vmap(
                lambda vid: jax.image.resize(
                    streams.masks[vid][..., None], (Hc, Wc, 1), "nearest"
                )
            )(vids)
            sds_c, c_gmag = sds_colla_step(
                k_c, gm, sds_colla_cfg, i, rgbs, masks_c, text_pair_rgb,
                return_aux=True,
            )
            gate_c = (i > 0).astype(jnp.float32)  # `nerf/utils.py:292`
            sds_total = sds_total + gate_c * sds_c
            metrics["sds_colla"] = gate_c * c_gmag

        return sds_total, metrics

    def loss_fn(params, streams: DeviceStreams, key, i, occ_grid, gm_arr):
        k_base, k_guide = jax.random.split(key)
        ropts_b = ropts
        if occ_cfg is not None and occ_grid is not None:
            import dataclasses as _dc

            from mvip_tpu.ops.occupancy import make_pruner

            ropts_b = _dc.replace(ropts, pruner=make_pruner(occ_grid, occ_cfg))
        loss, metrics = base_losses(params, streams, k_base, scfg, ropts_b,
                                    coarse_apply, fine_apply)
        sds_loss, gmetrics = guidance_losses(params, streams, k_guide, i,
                                             occ_grid, gm_arr)
        loss = loss + mcfg.sds_loss_weight * sds_loss
        metrics.update(gmetrics)
        metrics["loss"] = loss
        return loss, metrics

    def one_step(state: TrainState, streams: DeviceStreams, key, i,
                 occ_grid, gm_arr):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, streams, key, i, occ_grid, gm_arr
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    if n_inner <= 1:
        jitted = jax.jit(one_step, donate_argnums=(0,))

        def step_fn(state, streams, key, i, occ_grid=None):
            return jitted(state, streams, key, i, occ_grid, _gm_arrays)

        # AOT surface (tools/hbm_report.py): re-jitting step_fn from outside
        # would trace through it and re-bake _gm_arrays as constants of the
        # OUTER program — the exact 3.58 GB real-scale defect the argument
        # threading exists to prevent. Expose the inner jitted program and
        # the array bundle so AOT tooling lowers the trainer's own program.
        step_fn.jitted = jitted
        step_fn.gm_arrays = _gm_arrays
        return step_fn

    # Guidance megastep: `lax.scan` n_inner full MVIP steps per dispatch.
    # Same TPU-native dispatch-amortization trick as `step.make_train_scan`,
    # now covering the reference's ACTUAL hot loop (`run.py:919-1031` — the
    # per-step masked-view render + SDS). The step index i0+j stays a traced
    # scalar, so the in-step anneals/gates (`sd_utils.py:363`,
    # `nerf/utils.py:298`) see every inner step exactly as at stride 1.
    def train_scan(state: TrainState, streams: DeviceStreams, key, i0,
                   occ_grid, gm_arr):
        def body(st, j):
            return one_step(st, streams, jax.random.fold_in(key, j), i0 + j,
                            occ_grid, gm_arr)

        state, metrics = jax.lax.scan(body, state, jnp.arange(n_inner))
        return state, jax.tree.map(lambda m: m[-1], metrics)

    jitted_scan = jax.jit(train_scan, donate_argnums=(0,))

    def scan_fn(state, streams, key, i0, occ_grid=None):
        return jitted_scan(state, streams, key, i0, occ_grid, _gm_arrays)

    scan_fn.jitted = jitted_scan  # see step_fn.jitted above
    scan_fn.gm_arrays = _gm_arrays
    return scan_fn
