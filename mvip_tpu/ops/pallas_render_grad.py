"""Pallas TPU training megakernel: fused render with a hand-written backward.

Extends `ops/pallas_render.py` (forward-only eval kernel) to TRAINING: a
`jax.custom_vjp` whose forward is the fused embed->MLP->composite kernel and
whose backward is a second Pallas kernel that recomputes the forward with
activations VMEM-resident and backpropagates compositing + MLP to PARAMETER
gradients only (rays and sample depths carry no parameter dependence in the
train step — importance depths are stop-gradiented, reference `run.py:1812`).

Weight-gradient accumulation across ray blocks exploits the TPU grid's
sequential execution: every grid step adds its block's dW into the same output
ref (initialized at step 0 via @pl.when).

STATUS: gradients are bit-exact against jax.grad of the XLA renderer on the
compiled TPU path, but wall-clock is ~parity with XLA for fwd+bwd (the
custom-VJP forward runs once for outputs and the backward kernel recomputes it,
so total work is 2x fwd + bwd vs XLA's 1x fwd + bwd; the VMEM-residency saving
roughly cancels the recompute on v5e). Kept as an optional component — NOT
wired into the default train step. Round-2 tuning: emit the forward outputs
from the backward kernel so the forward runs once.

Backward math (raw2outputs semantics):
  alpha_i = 1 - exp(-sigma_i d_i),  T_i = exp(sum_{j<i} log(1-alpha_j)),
  w_i = alpha_i T_i
  wbar_i   = gbar_rgb . c_i + gbar_depth' z_i + gbar_acc'
  alphabar = wbar T - suffix_sum(wbar w) / (1 - alpha)
  sigmabar = alphabar d (1-alpha) [relu mask],  cbar = w gbar_rgb . c(1-c)
with disp = acc/depth and the white-background rgb += (1-acc) couplings folded
into gbar_depth'/gbar_acc'. Verified against jax.grad of the XLA renderer.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvip_tpu.models.nerf_mlp import NeRFMLPConfig
from mvip_tpu.ops.pallas_render import (
    _dense,
    _flatten_params,
    _pe,
    _unflatten_params,
    fused_render_mlp,
)


def _forward_mlp(params, cfg, pts, vd_pts, save, dtype=jnp.float32):
    """Forward through the PE-MLP, optionally recording layer inputs + masks.

    `dtype` is the matmul-operand/activation compute dtype (the bf16 mode of
    VERDICT r4 next #3 — the reference's own default is an fp16 FullyFusedMLP,
    `DS_NeRF/run_nerf_helpers_tcnn.py:48-60`). Accumulation stays f32
    (`preferred_element_type` in `_dense`); the PE trig, compositing, and loss
    math stay f32 regardless. Saved activations are stored in `dtype`, which
    halves the backward kernel's VMEM residency in bf16."""
    x = _pe(pts, cfg.multires).astype(dtype)
    h = x
    for i, layer in enumerate(params["pts"]):
        if save is not None:
            save["in_pts"].append(h)
        pre = _dense(layer, h)
        h = jax.nn.relu(pre).astype(dtype)
        if save is not None:
            save["mask_pts"].append(pre > 0)
        if i in cfg.skips:
            h = jnp.concatenate([x, h], -1)
    sigma_raw = _dense(params["alpha"], h)[:, 0]
    feat = _dense(params["feature"], h).astype(dtype)
    v = _pe(vd_pts, cfg.multires_views).astype(dtype)
    h2_in = jnp.concatenate([feat, v], -1)
    pre2 = _dense(params["views"], h2_in)
    h2 = jax.nn.relu(pre2).astype(dtype)
    rgb_raw = _dense(params["rgb"], h2)
    if save is not None:
        save["x"] = x
        save["trunk"] = h
        save["h2_in"] = h2_in
        save["mask_views"] = pre2 > 0
        save["h2"] = h2
    return sigma_raw, rgb_raw


def _bwd_kernel(ro_ref, rd_ref, z_ref, noise_ref, grgb_ref, gdisp_ref,
                gacc_ref, gdepth_ref, *refs, cfg: NeRFMLPConfig,
                white_bkgd: bool, names, n_params: int, fast: bool = False):
    param_refs = refs[:n_params]
    grad_refs = refs[n_params:]
    params = _unflatten_params(param_refs, names)

    ro = ro_ref[:]
    rd = rd_ref[:]
    z = z_ref[:]
    noise = noise_ref[:]
    R, S = z.shape
    P = R * S

    pts = (ro[:, None, :] + rd[:, None, :] * z[..., None]).reshape(P, 3)
    vd = rd * jax.lax.rsqrt(jnp.sum(rd * rd, -1, keepdims=True))
    vd_pts = jnp.broadcast_to(vd[:, None, :], (R, S, 3)).reshape(P, 3)

    save = {"in_pts": [], "mask_pts": []}
    sigma_raw, rgb_raw = _forward_mlp(params, cfg, pts, vd_pts, save)

    sigma_noisy = sigma_raw.reshape(R, S) + noise
    sigma = jax.nn.relu(sigma_noisy)
    c = jax.nn.sigmoid(rgb_raw).reshape(R, S, 3)

    # ---- recompute compositing ----
    norm_rd = jnp.sqrt(jnp.sum(rd * rd, -1, keepdims=True))
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((R, 1), 1e10, z.dtype)], -1
    ) * norm_rd
    alpha = 1.0 - jnp.exp(-sigma * dists)
    one_m = jnp.clip(1.0 - alpha, 1e-10, 1.0)
    log_t = jnp.log(one_m)
    ki = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    tri_excl = (ki < ji).astype(log_t.dtype)
    hp = jax.lax.Precision.HIGHEST
    T = jnp.exp(jax.lax.dot_general(
        log_t, tri_excl, (((1,), (0,)), ((), ())), precision=hp,
        preferred_element_type=jnp.float32))
    w = alpha * T
    depth = jnp.sum(w * z, 1)
    acc = jnp.sum(w, 1)

    # ---- output-cotangent assembly ----
    g_rgb = grgb_ref[:]          # [R, 3]
    g_disp = gdisp_ref[:, 0]     # [R]
    g_acc = gacc_ref[:, 0]
    g_depth = gdepth_ref[:, 0]

    # disp = where(acc > 1e-8, acc'/depth', 0) with mean_d = depth/max(acc,eps):
    # active branch (mean_d > 1e-10): disp = acc/depth
    active = (acc > 1e-8) & (depth / jnp.maximum(acc, 1e-10) > 1e-10)
    g_depth = g_depth + jnp.where(
        active, -g_disp * acc / jnp.maximum(depth * depth, 1e-20), 0.0
    )
    g_acc = g_acc + jnp.where(active, g_disp / jnp.maximum(depth, 1e-10), 0.0)
    if white_bkgd:  # rgb_map += (1 - acc)
        g_acc = g_acc - jnp.sum(g_rgb, -1)

    wbar = (
        jnp.sum(g_rgb[:, None, :] * c, -1)   # [R,S] (einsum dot layout fails Mosaic)
        + g_depth[:, None] * z
        + g_acc[:, None]
    )
    # suffix_k>i sum of wbar*w via strict-lower matmul (ji < ki)
    tri_suffix = (ki > ji).astype(log_t.dtype)
    suffix = jax.lax.dot_general(
        wbar * w, tri_suffix, (((1,), (0,)), ((), ())), precision=hp,
        preferred_element_type=jnp.float32)
    alphabar = wbar * T - suffix / one_m
    sigmabar = alphabar * dists * (1.0 - alpha)          # d alpha / d sigma
    sigmabar = sigmabar * (sigma_noisy > 0)              # relu at NOISY sigma
    cbar = w[..., None] * g_rgb[:, None, :] * c * (1.0 - c)  # sigmoid'

    g_sigma_raw = sigmabar.reshape(P, 1)
    g_rgb_raw = cbar.reshape(P, 3)

    # ---- MLP backward ----
    grads = {"pts": [None] * len(params["pts"])}

    def accum(name_path, g_w, g_b):
        for ref, name in zip(grad_refs, names):
            if name == name_path + ("w",):
                first = pl.program_id(0) == 0

                @pl.when(first)
                def _():
                    ref[:] = g_w

                @pl.when(jnp.logical_not(first))
                def _():
                    ref[:] = ref[:] + g_w
            elif name == name_path + ("b",):
                first = pl.program_id(0) == 0

                @pl.when(first)
                def _():
                    ref[:] = g_b

                @pl.when(jnp.logical_not(first))
                def _():
                    ref[:] = ref[:] + g_b

    # `fast` drops the dense matmuls to DEFAULT precision (what XLA autodiff
    # uses; HIGHEST costs ~2.7x wall-clock — see ops/pallas_train.py). The
    # tiny [S, S] compositing triangulars above always stay HIGHEST.
    dense_prec = None if fast else hp

    def dense_bwd(p, h_in, g_out):
        g_w = jax.lax.dot_general(h_in, g_out, (((0,), (0,)), ((), ())),
                                  precision=dense_prec,
                                  preferred_element_type=jnp.float32)
        g_b = jnp.sum(g_out, 0)
        g_in = jax.lax.dot_general(g_out, p["w"], (((1,), (1,)), ((), ())),
                                   precision=dense_prec,
                                   preferred_element_type=jnp.float32)
        return g_w, g_b, g_in

    # heads
    gw, gb, g_h2 = dense_bwd(params["rgb"], save["h2"], g_rgb_raw)
    accum(("rgb",), gw, gb)
    g_pre2 = g_h2 * save["mask_views"]
    gw, gb, g_h2in = dense_bwd(params["views"], save["h2_in"], g_pre2)
    accum(("views",), gw, gb)
    feat_dim = params["feature"]["w"].shape[1]
    g_feat = g_h2in[:, :feat_dim]
    gw, gb, g_trunk_f = dense_bwd(params["feature"], save["trunk"], g_feat)
    accum(("feature",), gw, gb)
    gw, gb, g_trunk_a = dense_bwd(params["alpha"], save["trunk"], g_sigma_raw)
    accum(("alpha",), gw, gb)
    g_h = g_trunk_f + g_trunk_a

    x_dim = save["x"].shape[1]
    for i in reversed(range(len(params["pts"]))):
        if i in cfg.skips:           # forward did h = concat([x, relu_out])
            g_h = g_h[:, x_dim:]     # x-part grads die (x has no params)
        g_pre = g_h * save["mask_pts"][i]
        gw, gb, g_h = dense_bwd(params["pts"][i], save["in_pts"][i], g_pre)
        accum(("pts", i), gw, gb)


def _run_bwd(params, cfg, rays_o, rays_d, z_vals, noise, cots, white_bkgd,
             block_rays, interpret, fast=False):
    N, S = z_vals.shape
    blk = min(block_rays, N)
    n_blocks = -(-N // blk)
    pad = n_blocks * blk - N
    g_rgb, g_disp, g_acc, g_depth = cots
    if pad:
        zpad = lambda a, c: jnp.concatenate([a, jnp.zeros((pad, c), a.dtype)])
        rays_o = jnp.concatenate([rays_o, jnp.broadcast_to(rays_o[-1:], (pad, 3))])
        rays_d = jnp.concatenate([rays_d, jnp.broadcast_to(rays_d[-1:], (pad, 3))])
        z_vals = jnp.concatenate([z_vals, jnp.broadcast_to(z_vals[-1:], (pad, S))])
        noise = zpad(noise, S)
        # ZERO cotangents for padded rays: they must not contribute to dW
        g_rgb, g_disp, g_acc, g_depth = (
            zpad(g_rgb, 3), zpad(g_disp[:, None], 1), zpad(g_acc[:, None], 1),
            zpad(g_depth[:, None], 1),
        )
    else:
        g_disp, g_acc, g_depth = (
            g_disp[:, None], g_acc[:, None], g_depth[:, None]
        )

    leaves, names = _flatten_params(params)
    ray_spec = lambda c: pl.BlockSpec((blk, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    const_spec = lambda l: pl.BlockSpec(l.shape, lambda i, nd=l.ndim: (0,) * nd,
                                        memory_space=pltpu.VMEM)
    w_specs = [const_spec(l) for l in leaves]
    out_specs = tuple(const_spec(l) for l in leaves)
    out_shapes = tuple(jax.ShapeDtypeStruct(l.shape, jnp.float32) for l in leaves)

    kern = partial(_bwd_kernel, cfg=cfg, white_bkgd=white_bkgd, names=names,
                   n_params=len(leaves), fast=fast)
    grad_leaves = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=(n_blocks,),
        in_specs=[ray_spec(3), ray_spec(3), ray_spec(S), ray_spec(S),
                  ray_spec(3), ray_spec(1), ray_spec(1), ray_spec(1)] + w_specs,
        out_specs=out_specs,
        # stored activations + weights + weight-grads exceed the 16MB default
        # scoped budget; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(rays_o, rays_d, z_vals, noise, g_rgb, g_disp, g_acc, g_depth, *leaves)

    # rebuild the param pytree of gradients
    grads = {"pts": [{} for _ in params["pts"]]}
    for leaf, name in zip(grad_leaves, names):
        if name[0] == "pts":
            grads["pts"][name[1]][name[2]] = leaf
        else:
            grads.setdefault(name[0], {})[name[1]] = leaf
    return grads


@partial(jax.custom_vjp, nondiff_argnums=(1, 6, 7, 8, 9))
def _fused_train_render_core(params, cfg: NeRFMLPConfig, rays_o, rays_d,
                             z_vals, noise, white_bkgd: bool,
                             block_rays: int, interpret: bool,
                             fast_bwd: bool) -> Dict[str, jnp.ndarray]:
    out = fused_render_mlp(params, cfg, rays_o, rays_d, z_vals,
                           white_bkgd=white_bkgd, block_rays=block_rays,
                           interpret=interpret, noise=noise)
    return {k: out[k] for k in ("rgb", "disp", "acc", "depth")}


def _ftr_fwd(params, cfg, rays_o, rays_d, z_vals, noise, white_bkgd,
             block_rays, interpret, fast_bwd):
    out = _fused_train_render_core(params, cfg, rays_o, rays_d, z_vals, noise,
                                   white_bkgd, block_rays, interpret, fast_bwd)
    return out, (params, rays_o, rays_d, z_vals, noise)


def _ftr_bwd(cfg, white_bkgd, block_rays, interpret, fast_bwd, res, cots):
    params, rays_o, rays_d, z_vals, noise = res
    g = (cots["rgb"], cots["disp"], cots["acc"], cots["depth"])
    grads = _run_bwd(params, cfg, rays_o, rays_d, z_vals, noise, g, white_bkgd,
                     block_rays, interpret, fast=fast_bwd)
    return (grads, jnp.zeros_like(rays_o), jnp.zeros_like(rays_d),
            jnp.zeros_like(z_vals), jnp.zeros_like(noise))


_fused_train_render_core.defvjp(_ftr_fwd, _ftr_bwd)


def fused_train_render(params, cfg: NeRFMLPConfig, rays_o, rays_d, z_vals,
                       white_bkgd: bool = False, block_rays: int = 16,
                       interpret: bool = False, fast_bwd: bool = False,
                       noise=None) -> Dict[str, jnp.ndarray]:
    """Differentiable (w.r.t. params ONLY) fused render for the MLP backbone.

    Returns {rgb, disp, acc, depth}. Rays/z_vals/noise receive zero gradient —
    the train step never needs them (importance depths are detached).
    `noise` [N, S] is pre-relu sigma noise (the reference's raw_noise_std
    regularizer, `run_nerf_helpers.py:366`); None = off.
    `fast_bwd` drops the backward's dense matmuls to DEFAULT precision
    (matching XLA autodiff; the bit-exact mode keeps HIGHEST)."""
    if noise is None:
        noise = jnp.zeros_like(z_vals)
    return _fused_train_render_core(params, cfg, rays_o, rays_d, z_vals, noise,
                                    white_bkgd, block_rays, interpret, fast_bwd)


def fused_train_hier_render(
    key,
    params_coarse,
    params_fine,
    cfg: NeRFMLPConfig,
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
) -> Dict[str, jnp.ndarray]:
    """Training-mode hierarchical render on the fused megakernels,
    differentiable w.r.t. the FINE params only.

    The Pallas replacement for `render_rays` in the guidance losses
    (`train/mvip_step.py`): same stochastic semantics (jittered z, sigma
    noise, inverse-CDF importance draw — key split order matches
    `render/renderer.py:render_rays` so draws are identical given the same
    key), but the coarse pass runs the forward-only megakernel (its only role
    in the guidance loss is importance sampling, which the reference detaches
    — `run.py:1812`) and the fine pass the custom-VJP megakernel with
    `fast_bwd`. No remat, no [P*S, 256] HBM activations.
    """
    from mvip_tpu.ops.pallas_sampling import sample_pdf_pallas
    from mvip_tpu.ops.sampling import merge_z_vals, sample_pdf, stratified_z_vals

    from mvip_tpu.ops.occupancy import PHANTOM_NOISE, phantom_ladder

    R = rays_o.shape[0]
    if key is None:
        k_strat = k_noise0 = k_pdf = k_noise1 = None
    else:
        k_strat, k_noise0, k_pdf, k_noise1 = jax.random.split(key, 4)

    def _pruned(z, k_noise):
        """Interval-occupancy pruning with the phantom-sample last-width
        trick (`ops/occupancy.phantom_ladder`) — see the hash-grid twin."""
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
        elif had:
            noise = jnp.zeros((R, S))
        else:
            noise = None
        if had:
            noise = noise.at[:, -1].set(PHANTOM_NOISE)
        return z, noise, had

    z, noise0, ph0 = _pruned(
        stratified_z_vals(k_strat, R, n_samples, near, far,
                          lindisp=lindisp, perturb=perturb),
        k_noise0,
    )
    pc = jax.lax.stop_gradient(params_coarse)
    coarse = fused_render_mlp(pc, cfg, rays_o, rays_d, z,
                              white_bkgd=white_bkgd, block_rays=block_rays,
                              interpret=interpret, noise=noise0)
    # importance PDF over the REAL samples only (phantom's huge midpoint
    # would stretch the last CDF bin)
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
        merge_z_vals(z_r, jax.lax.stop_gradient(z_fine)), k_noise1
    )
    out = fused_train_render(params_fine, cfg, rays_o, rays_d, z_all,
                             white_bkgd=white_bkgd, block_rays=block_rays,
                             interpret=interpret, fast_bwd=True, noise=noise1)
    return out
