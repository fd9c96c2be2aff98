"""Differentiable fused RENDER for the hash-grid backbone (guidance hot path).

The MVIP guidance losses (`train/mvip_step.py`, reference `run.py:862-975`)
render whole masked views per step and backprop an SDS cotangent through the
render. For the PE-MLP backbone that path runs on
`pallas_render_grad.fused_train_render`; this module is the hash-grid
equivalent (VERDICT r1 next-step #3: "the task-2 kernel for the hash grid"):

  forward:  transposed encode kernel -> `_hash_render_kernel`
            (sigma net -> SH color net -> compositing, VMEM-resident)
  backward: `_hash_render_bwd_kernel` recomputes the MLP forward from the
            SAVED encode features (so the expensive encode is NOT re-run),
            backprops compositing + nets to (net grads, d_enc), then the
            transposed table-gradient kernel turns d_enc into d_table.

Differentiable w.r.t. table + net params ONLY (rays/z/noise get zero
cotangents — importance depths are detached in the train step, reference
`run.py:1812`). Network math is shared with `pallas_hash_train` through the
same layer conventions; compositing fwd/bwd comes from `pallas_train`.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvip_tpu.ops.pallas_hash_train import (
    _flatten_nets,
    _grad_shapes,
    _unflatten_nets,
    names_grads,
    nets_backward,
    nets_forward as _nets_forward,
    reassemble_net_grads,
)
from mvip_tpu.ops.pallas_train import (
    composite_bwd,
    composite_fwd,
)


def _hash_render_kernel(rd_ref, z_ref, noise_ref, sh_ref, enc_ref, *refs,
                        n_params: int, names, geo_dim: int, sh_dim: int,
                        white_bkgd: bool):
    param_refs = refs[:n_params]
    rgb_ref, disp_ref, acc_ref, depth_ref, weights_ref = refs[n_params:]
    nets = _unflatten_nets(param_refs, names)

    rd = rd_ref[:]
    z = z_ref[:]
    noise = noise_ref[:]
    R, S = z.shape
    P = R * S
    enc = enc_ref[:]
    sh = sh_ref[:]
    sh_p = jnp.broadcast_to(sh[:, None, :], (R, S, sh_dim)).reshape(P, sh_dim)

    sigma_raw, rgb_raw, _ = _nets_forward(nets, enc, sh_p, geo_dim, sh_dim)
    sigma = jax.nn.relu(sigma_raw.reshape(R, S) + noise)
    c = jax.nn.sigmoid(rgb_raw).reshape(R, S, 3)
    out, _ = composite_fwd(z, rd, sigma, c, white_bkgd)

    rgb_ref[:] = out["rgb"]
    disp_ref[:] = out["disp"][:, None]
    acc_ref[:] = out["acc"][:, None]
    depth_ref[:] = out["depth"][:, None]
    weights_ref[:] = out["weights"]


def _hash_render_bwd_kernel(rd_ref, z_ref, noise_ref, sh_ref, enc_ref,
                            grgb_ref, gdisp_ref, gacc_ref, gdepth_ref, *refs,
                            n_params: int, names, geo_dim: int, sh_dim: int,
                            white_bkgd: bool):
    param_refs = refs[:n_params]
    denc_ref = refs[n_params]
    grad_refs = refs[n_params + 1:]
    nets = _unflatten_nets(param_refs, names)

    rd = rd_ref[:]
    z = z_ref[:]
    noise = noise_ref[:]
    R, S = z.shape
    P = R * S
    enc = enc_ref[:]
    sh = sh_ref[:]
    sh_p = jnp.broadcast_to(sh[:, None, :], (R, S, sh_dim)).reshape(P, sh_dim)

    save = {}
    sigma_raw, rgb_raw, w_geo = _nets_forward(
        nets, enc, sh_p, geo_dim, sh_dim, save
    )
    sigma_noisy = sigma_raw.reshape(R, S) + noise
    sigma = jax.nn.relu(sigma_noisy)
    c = jax.nn.sigmoid(rgb_raw).reshape(R, S, 3)
    out, resid = composite_fwd(z, rd, sigma, c, white_bkgd)
    w = out["weights"]

    sigmabar, cbar = composite_bwd(
        z, w, c, sigma_noisy, out, resid,
        grgb_ref[:], gdisp_ref[:, 0], gdepth_ref[:, 0], gacc_ref[:, 0],
        white_bkgd,
    )
    g_sigma = sigmabar.reshape(P, 1)
    g_rgb_raw = cbar.reshape(P, 3)

    first = pl.program_id(0) == 0
    gref = {name: ref for name, ref in zip(names_grads(names), grad_refs)}
    denc_ref[:] = nets_backward(nets, save, sh_p, w_geo, g_sigma, g_rgb_raw,
                                gref, first)


def _pad_ray_arrays(blk, S, E, sh_dim, rd, z, noise, sh, enc, extra=()):
    N = z.shape[0]
    n_blocks = -(-N // blk)
    pad = n_blocks * blk - N
    if pad:
        zpadc = lambda a, c: jnp.concatenate([a, jnp.zeros((pad, c), a.dtype)])
        rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (pad, 3))])
        z = jnp.concatenate([z, jnp.broadcast_to(z[-1:], (pad, S))])
        noise = zpadc(noise, S)
        sh = jnp.concatenate([sh, jnp.broadcast_to(sh[-1:], (pad, sh_dim))])
        enc = jnp.concatenate([enc, jnp.zeros((pad * S, E), enc.dtype)])
        extra = tuple(zpadc(a, a.shape[1]) for a in extra)
    return n_blocks, pad, rd, z, noise, sh, enc, extra


@partial(jax.jit, static_argnames=("geo_dim", "sh_dim", "white_bkgd",
                                   "block_rays", "interpret"))
def _render_fwd_call(nets, rd, z, noise, sh, enc, geo_dim, sh_dim,
                     white_bkgd, block_rays, interpret):
    N, S = z.shape
    E = enc.shape[-1]
    blk = min(block_rays, N)
    n_blocks, _, rd, z, noise, sh, enc, _ = _pad_ray_arrays(
        blk, S, E, sh_dim, rd, z, noise, sh, enc
    )
    leaves, names = _flatten_nets(nets)
    ray_spec = lambda c: pl.BlockSpec((blk, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    pt_spec = pl.BlockSpec((blk * S, E), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    const_spec = lambda shp: pl.BlockSpec(shp, lambda i, nd=len(shp): (0,) * nd,
                                          memory_space=pltpu.VMEM)
    kern = partial(_hash_render_kernel, n_params=len(leaves), names=names,
                   geo_dim=geo_dim, sh_dim=sh_dim, white_bkgd=white_bkgd)
    NB = n_blocks * blk
    outs = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((NB, 3), jnp.float32),
            jax.ShapeDtypeStruct((NB, 1), jnp.float32),
            jax.ShapeDtypeStruct((NB, 1), jnp.float32),
            jax.ShapeDtypeStruct((NB, 1), jnp.float32),
            jax.ShapeDtypeStruct((NB, S), jnp.float32),
        ),
        grid=(n_blocks,),
        in_specs=[ray_spec(3), ray_spec(S), ray_spec(S), ray_spec(sh_dim),
                  pt_spec] + [const_spec(l.shape) for l in leaves],
        out_specs=(ray_spec(3), ray_spec(1), ray_spec(1), ray_spec(1),
                   ray_spec(S)),
        interpret=interpret,
    )(rd, z, noise, sh, enc, *leaves)
    rgb, disp, acc, depth, weights = outs
    return {"rgb": rgb[:N], "disp": disp[:N, 0], "acc": acc[:N, 0],
            "depth": depth[:N, 0], "weights": weights[:N]}


@partial(jax.jit, static_argnames=("geo_dim", "sh_dim", "white_bkgd",
                                   "block_rays", "interpret"))
def _render_bwd_call(nets, rd, z, noise, sh, enc, cots, geo_dim, sh_dim,
                     white_bkgd, block_rays, interpret):
    N, S = z.shape
    E = enc.shape[-1]
    blk = min(block_rays, N)
    g_rgb, g_disp, g_acc, g_depth = cots
    n_blocks, _, rd, z, noise, sh, enc, (g_rgb, g_disp, g_acc, g_depth) = (
        _pad_ray_arrays(
            blk, S, E, sh_dim, rd, z, noise, sh, enc,
            # ZERO cotangents on padded rays: no gradient contribution
            extra=(g_rgb, g_disp[:, None], g_acc[:, None], g_depth[:, None]),
        )
    )
    leaves, names = _flatten_nets(nets)
    gshapes = _grad_shapes(leaves, names, geo_dim, sh_dim)
    ray_spec = lambda c: pl.BlockSpec((blk, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    pt_spec = pl.BlockSpec((blk * S, E), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    const_spec = lambda shp: pl.BlockSpec(shp, lambda i, nd=len(shp): (0,) * nd,
                                          memory_space=pltpu.VMEM)
    kern = partial(_hash_render_bwd_kernel, n_params=len(leaves), names=names,
                   geo_dim=geo_dim, sh_dim=sh_dim, white_bkgd=white_bkgd)
    outs = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * blk * S, E), jnp.float32),
        ) + tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in gshapes),
        grid=(n_blocks,),
        in_specs=[ray_spec(3), ray_spec(S), ray_spec(S), ray_spec(sh_dim),
                  pt_spec, ray_spec(3), ray_spec(1), ray_spec(1), ray_spec(1)]
                 + [const_spec(l.shape) for l in leaves],
        out_specs=(pt_spec,) + tuple(const_spec(s) for s in gshapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(rd, z, noise, sh, enc, g_rgb, g_disp, g_acc, g_depth, *leaves)
    d_enc = outs[0][: N * S]
    grads = reassemble_net_grads(names, dict(zip(names_grads(names), outs[1:])))
    return d_enc, grads


def _encode_inputs(params, hcfg, rays_o, rays_d, z_vals, interpret):
    from mvip_tpu.models.nerf_hashgrid import dense_levels, sh_encoding
    from mvip_tpu.ops.pallas_hashgrid_s import _sorted_fwd, sorted_encode_active
    from mvip_tpu.ops.pallas_hashgrid_t import _encode_fwd_t

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    x01 = jnp.clip(
        (pts.reshape(-1, 3) + hcfg.bound) / (2.0 * hcfg.bound), 0.0, 1.0
    )
    res_arr = jnp.asarray(hcfg.resolutions, jnp.int32)
    dense_i = dense_levels(hcfg.resolutions, hcfg.table_size).astype(jnp.int32)
    if sorted_encode_active(hcfg):
        enc, enc_res = _sorted_fwd(params["table"].astype(jnp.float32), x01,
                                   res_arr, dense_i,
                                   table_size=hcfg.table_size,
                                   interpret=interpret)
    else:
        enc = _encode_fwd_t(params["table"].astype(jnp.float32), x01, res_arr,
                            dense_i, table_size=hcfg.table_size,
                            block=hcfg.fused_block,
                            compute_dtype=hcfg.fused_dtype,
                            interpret=interpret, res_static=hcfg.resolutions)
        enc_res = None
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    sh = sh_encoding(vd, hcfg.sh_degree)
    return x01, enc, sh, res_arr, dense_i, enc_res


@partial(jax.custom_vjp, nondiff_argnums=(1, 6, 7, 8, 9))
def _hash_train_render_core(params, hcfg, rays_o, rays_d, z_vals, noise,
                            white_bkgd, block_rays, interpret,
                            fast_bwd) -> Dict[str, jnp.ndarray]:
    x01, enc, sh, _, _, _ = _encode_inputs(params, hcfg, rays_o, rays_d,
                                           z_vals, interpret)
    nets = {"sigma_net": params["sigma_net"], "color_net": params["color_net"]}
    out = _render_fwd_call(nets, rays_d, z_vals, noise, sh, enc,
                           hcfg.geo_feat_dim, hcfg.sh_dim, white_bkgd,
                           block_rays, interpret)
    return {k: out[k] for k in ("rgb", "disp", "acc", "depth")}


def _htr_fwd(params, hcfg, rays_o, rays_d, z_vals, noise, white_bkgd,
             block_rays, interpret, fast_bwd):
    out = _hash_train_render_core(params, hcfg, rays_o, rays_d, z_vals, noise,
                                  white_bkgd, block_rays, interpret, fast_bwd)
    return out, (params, rays_o, rays_d, z_vals, noise)


def _htr_bwd(hcfg, white_bkgd, block_rays, interpret, fast_bwd, res, cots):
    from mvip_tpu.ops.pallas_hashgrid_t import _encode_bwd_table_t

    params, rays_o, rays_d, z_vals, noise = res
    # re-run the (cheap, fused) encode rather than saving [N*S, L*F] residuals
    # across the whole guidance graph
    x01, enc, sh, res_arr, dense_i, enc_res = _encode_inputs(
        params, hcfg, rays_o, rays_d, z_vals, interpret
    )
    nets = {"sigma_net": params["sigma_net"], "color_net": params["color_net"]}
    g = (cots["rgb"], cots["disp"], cots["acc"], cots["depth"])
    d_enc, net_grads = _render_bwd_call(
        nets, rays_d, z_vals, noise, sh, enc, g, hcfg.geo_feat_dim,
        hcfg.sh_dim, white_bkgd, block_rays, interpret,
    )
    if enc_res is not None:
        from mvip_tpu.ops.pallas_hashgrid_s import _sorted_bwd_table

        sidx, sw, rank, any_ovf = enc_res
        d_table = _sorted_bwd_table(
            x01, d_enc, sidx, sw, rank, any_ovf, res_arr, dense_i,
            L=hcfg.n_levels, F=hcfg.n_features, table_size=hcfg.table_size,
            interpret=interpret,
        )
    else:
        d_table = _encode_bwd_table_t(
            x01, d_enc, res_arr, dense_i, L=hcfg.n_levels, F=hcfg.n_features,
            table_size=hcfg.table_size, block=hcfg.fused_block,
            compute_dtype=hcfg.fused_dtype, interpret=interpret,
            res_static=hcfg.resolutions,
        )
    grads = {"table": d_table.astype(params["table"].dtype), **net_grads}
    return (grads, jnp.zeros_like(rays_o), jnp.zeros_like(rays_d),
            jnp.zeros_like(z_vals), jnp.zeros_like(noise))


_hash_train_render_core.defvjp(_htr_fwd, _htr_bwd)


def hash_train_render(params, hcfg, rays_o, rays_d, z_vals,
                      white_bkgd: bool = False, block_rays: int = 16,
                      interpret: bool = False, noise=None):
    """Differentiable (w.r.t. table+net params) fused render, hash-grid
    backbone. Same contract as `pallas_render_grad.fused_train_render`."""
    if noise is None:
        noise = jnp.zeros_like(z_vals)
    return _hash_train_render_core(params, hcfg, rays_o, rays_d, z_vals,
                                   noise, white_bkgd, block_rays, interpret,
                                   False)


def hash_train_hier_render(
    key,
    params_coarse,
    params_fine,
    hcfg,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int,
    n_importance: int,
    perturb: float = 1.0,
    raw_noise_std: float = 0.0,
    lindisp: bool = False,
    white_bkgd: bool = False,
    block_rays: int = 16,
    interpret: bool = False,
    pruner=None,
    return_extras: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Hash-grid twin of `fused_train_hier_render`: stochastic coarse ->
    importance -> fine render on the fused kernels, differentiable w.r.t. the
    FINE model only (the coarse pass only feeds the detached importance draw).
    Key split order matches `render/renderer.py:render_rays`.

    `pruner`: optional interval-mode occupancy pruner (`ops/occupancy.py`)
    applied at both stages exactly like `render_rays` does; the pruned
    last-stratum width rides a phantom sample (`phantom_ladder`) whose noise
    slot zeroes its sigma, so the kernels stay untouched."""
    from mvip_tpu.ops.occupancy import PHANTOM_NOISE, phantom_ladder
    from mvip_tpu.ops.pallas_sampling import sample_pdf_pallas
    from mvip_tpu.ops.sampling import merge_z_vals, sample_pdf, stratified_z_vals

    R = rays_o.shape[0]
    if key is None:
        k_strat = k_noise0 = k_pdf = k_noise1 = None
    else:
        k_strat, k_noise0, k_pdf, k_noise1 = jax.random.split(key, 4)

    def _pruned(z, k_noise, need_array):
        """(ladder, noise key) -> (ladder', noise', had_phantom)."""
        had = False
        if pruner is not None:
            z_p, d_p = pruner(rays_o, rays_d, z)
            z = z_p
            if d_p is not None:
                z = phantom_ladder(z_p, d_p)
                had = True
        S = z.shape[-1]
        if raw_noise_std > 0:
            noise = jax.random.normal(k_noise, (R, S)) * raw_noise_std
        elif need_array or had:
            noise = jnp.zeros((R, S))
        else:
            noise = None
        if had:
            noise = noise.at[:, -1].set(PHANTOM_NOISE)
        return z, noise, had

    z, noise0, ph0 = _pruned(
        stratified_z_vals(k_strat, R, n_samples, near, far,
                          lindisp=lindisp, perturb=perturb),
        k_noise0, need_array=True,
    )
    pc = jax.lax.stop_gradient(params_coarse)
    x01, enc, sh, _, _, _ = _encode_inputs(pc, hcfg, rays_o, rays_d, z, interpret)
    nets = {"sigma_net": pc["sigma_net"], "color_net": pc["color_net"]}
    coarse = _render_fwd_call(nets, rays_d, z, noise0, sh, enc,
                              hcfg.geo_feat_dim, hcfg.sh_dim, white_bkgd,
                              block_rays, interpret)
    # importance PDF over the REAL samples only (drop the phantom slot — its
    # weight is 0 but its huge midpoint would stretch the last CDF bin)
    z_r = z[:, :-1] if ph0 else z
    w_r = coarse["weights"][:, :-1] if ph0 else coarse["weights"]
    z_mid = 0.5 * (z_r[:, 1:] + z_r[:, :-1])
    w_mid = jax.lax.stop_gradient(w_r[:, 1:-1])
    if interpret:
        z_fine = sample_pdf(z_mid, w_mid, n_importance, key=k_pdf,
                            det=(perturb == 0.0))
    else:
        z_fine = sample_pdf_pallas(z_mid, w_mid, n_importance, key=k_pdf,
                                   det=(perturb == 0.0))
    z_all, noise1, _ = _pruned(
        merge_z_vals(z_r, jax.lax.stop_gradient(z_fine)),
        k_noise1, need_array=False,
    )
    if return_extras:
        # Eval-only full-output path (render-tree dump, `run.py:1329-1343`):
        # call the fused kernels directly — no custom_vjp wrapper, so the
        # kernel's per-sample `weights` output survives, plus the merged
        # ladder. Not differentiable; eval renders never are.
        x01f, encf, shf, _, _, _ = _encode_inputs(
            params_fine, hcfg, rays_o, rays_d, z_all, interpret
        )
        netsf = {"sigma_net": params_fine["sigma_net"],
                 "color_net": params_fine["color_net"]}
        nz = noise1 if noise1 is not None else jnp.zeros_like(z_all)
        out = dict(_render_fwd_call(netsf, rays_d, z_all, nz, shf, encf,
                                    hcfg.geo_feat_dim, hcfg.sh_dim,
                                    white_bkgd, block_rays, interpret))
        out["z_vals"] = z_all
        return out
    return hash_train_render(params_fine, hcfg, rays_o, rays_d, z_all,
                             white_bkgd=white_bkgd, block_rays=block_rays,
                             interpret=interpret, noise=noise1)


def hash_render_image(
    params_coarse,
    params_fine,
    hcfg,
    H: int,
    W: int,
    focal,
    c2w,
    near: float,
    far: float,
    n_samples: int,
    n_importance: int,
    lindisp: bool = False,
    white_bkgd: bool = False,
    chunk: int = 8192,
    block_rays: int = 16,
    interpret: bool = False,
    extras: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full-image deterministic render on the fused hash-grid pipeline — the
    hash-grid twin of `pallas_render.fused_render_image`, serving the eval /
    testset / video paths (reference hot loop `run.py:1222-1362`) from the
    transposed encode + render megakernels instead of the XLA apply.
    `extras` adds the per-sample weights/z_vals/alpha maps (render-tree dump
    contract, `run.py:1329-1343`)."""
    from mvip_tpu.ops.rays import rays_for_pose

    ro, rd = rays_for_pose(H, W, focal, c2w)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    outs = {"rgb": [], "disp": [], "acc": [], "depth": []}
    if extras:
        outs.update(weights=[], z_vals=[], alpha=[])
    n = ro.shape[0]
    for i in range(0, n, chunk):
        ret = hash_train_hier_render(
            None, params_coarse, params_fine, hcfg, ro[i : i + chunk],
            rd[i : i + chunk], near, far, n_samples, n_importance,
            perturb=0.0, raw_noise_std=0.0, lindisp=lindisp,
            white_bkgd=white_bkgd, block_rays=block_rays, interpret=interpret,
            return_extras=extras,
        )
        if extras:
            from mvip_tpu.ops.compositing import alpha_from_weights

            ret["alpha"] = alpha_from_weights(ret["weights"])
        for k in outs:
            outs[k].append(ret[k])
    return {k: jnp.concatenate(v).reshape(H, W, *v[0].shape[1:])
            for k, v in outs.items()}
