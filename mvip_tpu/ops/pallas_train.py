"""Pallas TPU fused TRAINING step kernel: render + loss + backward in one pass.

`ops/pallas_render_grad.py` made the fused render differentiable via
`jax.custom_vjp`, but paid 2x forward (the VJP forward for outputs + a full
recompute inside the backward kernel) — wall-clock parity with XLA. This
module removes the extra forward for the guidance-off training workload by
computing the LOSS COTANGENTS inside the kernel: one pallas_call per model
runs embed -> MLP -> compositing -> per-ray loss terms -> full backward to
parameter gradients, with every activation VMEM-resident and zero HBM
activation traffic (the XLA formulation spills [R*S, 256] layer activations).

Loss surface (the reference's guidance-off second stage, `run.py:996-1027`,
as assembled by `train/step.py:base_losses`): per-ray scale arrays fold the
three MSE terms into one kernel —
    loss = sum_i  s_rgb_i  * |rgb_i   - t_rgb_i|^2      (img / img0 loss)
         + sum_i  s_disp_i * (disp_i  - t_disp_i)^2     (inpainted-depth loss)
         + sum_i  s_depth_i* (depth_i - t_depth_i)^2    (COLMAP depth loss)
so the clf / inpainted-depth / sparse-depth batches concatenate into ONE ray
batch per kernel launch with per-ray scales selecting each term (zero scale =
no gradient), and d loss/d out = 2*s*(out - t) is formed in-kernel.

Training stochasticity: jittered z comes in as an input (computed by
`ops/sampling.stratified_z_vals` outside), and the raw_noise_std sigma noise
comes in as a [R, S] input drawn with jax.random outside — so the kernel
stays deterministic given its inputs and the RNG semantics match the XLA
step's `composite(..., noise=...)` exactly.

The backward math mirrors `pallas_render_grad._bwd_kernel` (verified there
bit-exactly against jax.grad of the XLA renderer), extended with the
relu-mask-at-noisy-sigma (`compositing.render_weights`) and the direct depth
cotangent. Gradients accumulate across ray blocks in the kernel outputs
(sequential TPU grid); loss sums accumulate the same way.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvip_tpu.models.nerf_mlp import NeRFMLPConfig
from mvip_tpu.ops.pallas_render import _flatten_params
from mvip_tpu.ops.pallas_render_grad import _forward_mlp, _unflatten_params


def composite_fwd(z, rd, sigma, c, white_bkgd: bool):
    """In-kernel compositing forward (raw2outputs semantics).

    sigma [R, S] post-relu, c [R, S, 3] post-sigmoid. Returns the dict of
    per-ray maps plus the residues the backward needs. The exclusive
    transmittance cumsum runs as a HIGHEST-precision triangular MXU matmul
    (Mosaic has no cumsum; default precision loses ~1e-3 here)."""
    R, S = z.shape
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
    rgb_map = jnp.sum(w[..., None] * c, 1)                  # [R, 3]
    depth = jnp.sum(w * z, 1)
    acc = jnp.sum(w, 1)
    mean_d = depth / jnp.maximum(acc, 1e-10)
    disp = jnp.where(acc > 1e-8, 1.0 / jnp.maximum(1e-10, mean_d), 0.0)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[:, None])
    resid = dict(dists=dists, alpha=alpha, one_m=one_m, T=T, ki=ki, ji=ji)
    return dict(rgb=rgb_map, depth=depth, acc=acc, disp=disp, mean_d=mean_d,
                weights=w), resid


def composite_bwd(z, w, c, sigma_noisy, out, resid, g_rgb, g_disp, g_depth,
                  g_acc, white_bkgd: bool):
    """Compositing backward: output cotangents -> (d sigma_raw, d rgb_raw).

    Math verified bit-exact against jax.grad of the XLA renderer
    (tests/test_pallas_render.py). `sigma_noisy` is the pre-relu noisy sigma
    (relu mask applies there, `ops/compositing.render_weights`)."""
    depth, acc = out["depth"], out["acc"]
    active = (acc > 1e-8) & (out["mean_d"] > 1e-10)
    g_depth = g_depth + jnp.where(
        active, -g_disp * acc / jnp.maximum(depth * depth, 1e-20), 0.0
    )
    g_acc = g_acc + jnp.where(active, g_disp / jnp.maximum(depth, 1e-10), 0.0)
    if white_bkgd:
        g_acc = g_acc - jnp.sum(g_rgb, -1)

    wbar = (
        jnp.sum(g_rgb[:, None, :] * c, -1)
        + g_depth[:, None] * z
        + g_acc[:, None]
    )
    hp = jax.lax.Precision.HIGHEST
    tri_suffix = (resid["ki"] > resid["ji"]).astype(z.dtype)
    suffix = jax.lax.dot_general(
        wbar * w, tri_suffix, (((1,), (0,)), ((), ())), precision=hp,
        preferred_element_type=jnp.float32)
    alphabar = wbar * resid["T"] - suffix / resid["one_m"]
    sigmabar = alphabar * resid["dists"] * (1.0 - resid["alpha"])
    sigmabar = sigmabar * (sigma_noisy > 0)                  # relu at noisy sigma
    cbar = w[..., None] * g_rgb[:, None, :] * c * (1.0 - c)
    return sigmabar, cbar


def mse_loss_cotangents(out, trgb, tdisp, tdepth, s_rgb, s_disp, s_depth):
    """Per-ray scaled-MSE loss terms and the output cotangents they induce
    (see module docstring for the scale-array loss surface)."""
    d_rgb = out["rgb"] - trgb                                # [R, 3]
    d_disp = out["disp"] - tdisp
    d_depth = out["depth"] - tdepth
    l_rgb = s_rgb * jnp.sum(d_rgb * d_rgb, -1)               # [R]
    l_disp = s_disp * d_disp * d_disp
    l_depth = s_depth * d_depth * d_depth
    g_rgb = 2.0 * s_rgb[:, None] * d_rgb                     # [R, 3]
    g_disp = 2.0 * s_disp * d_disp
    g_depth = 2.0 * s_depth * d_depth
    return (l_rgb, l_disp, l_depth), (g_rgb, g_disp, g_depth)


def loss_lanes_sum(l_rgb, l_disp, l_depth, R):
    """Block loss totals into lanes 0..2 of a [1, 128] vector (Mosaic aborts
    on 0-d scalar reductions)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    lvec = (
        jnp.where(lane == 0, l_rgb[:, None], 0.0)
        + jnp.where(lane == 1, l_disp[:, None], 0.0)
        + jnp.where(lane == 2, l_depth[:, None], 0.0)
    )
    return jnp.sum(lvec, 0, keepdims=True)                   # [1, 128]


def accum_ref(ref, val, first):
    """Initialize-or-accumulate an output ref across sequential grid steps."""
    @pl.when(first)
    def _():
        ref[:] = val

    @pl.when(jnp.logical_not(first))
    def _():
        ref[:] = ref[:] + val


def dense_bwd_prec(p, h_in, g_out, precision=None, dtype=jnp.float32):
    """Dense-layer backward: (dW, db, d_input). DEFAULT matmul precision
    matches XLA autodiff; HIGHEST costs ~3x MXU throughput. `dtype` is the
    matmul-operand dtype (bf16 compute mode); grads accumulate f32."""
    g_out_c = g_out.astype(dtype)
    g_w = jax.lax.dot_general(h_in.astype(dtype), g_out_c,
                              (((0,), (0,)), ((), ())),
                              precision=precision,
                              preferred_element_type=jnp.float32)
    g_b = jnp.sum(g_out, 0)
    g_in = jax.lax.dot_general(g_out_c, p["w"].astype(dtype),
                               (((1,), (1,)), ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)
    return g_w, g_b, g_in


def _train_kernel(ro_ref, rd_ref, z_ref, noise_ref, trgb_ref, tdisp_ref,
                  tdepth_ref, srgb_ref, sdisp_ref, sdepth_ref, *refs,
                  cfg: NeRFMLPConfig, white_bkgd: bool, names, n_params: int,
                  compute_dtype=jnp.float32):
    param_refs = refs[:n_params]
    weights_ref = refs[n_params]
    sq_refs = refs[n_params + 1]          # [1, 128]: loss sums in lanes 0..2
    grad_refs = refs[n_params + 2:]
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
    sigma_raw, rgb_raw = _forward_mlp(params, cfg, pts, vd_pts, save,
                                      dtype=compute_dtype)

    sigma_noisy = sigma_raw.reshape(R, S) + noise
    sigma = jax.nn.relu(sigma_noisy)
    c = jax.nn.sigmoid(rgb_raw).reshape(R, S, 3)

    out, resid = composite_fwd(z, rd, sigma, c, white_bkgd)
    w = out["weights"]

    s_rgb = srgb_ref[:, 0]       # [R]
    s_disp = sdisp_ref[:, 0]
    s_depth = sdepth_ref[:, 0]
    (l_rgb, l_disp, l_depth), (g_rgb, g_disp, g_depth) = mse_loss_cotangents(
        out, trgb_ref[:], tdisp_ref[:, 0], tdepth_ref[:, 0],
        s_rgb, s_disp, s_depth,
    )
    sigmabar, cbar = composite_bwd(
        z, w, c, sigma_noisy, out, resid, g_rgb, g_disp, g_depth,
        jnp.zeros_like(g_depth), white_bkgd,
    )
    g_sigma_raw = sigmabar.reshape(P, 1)
    g_rgb_raw = cbar.reshape(P, 3)

    # ---- MLP backward with grad accumulation across blocks ----
    first = pl.program_id(0) == 0

    def accum(name_path, g_w, g_b):
        for ref, name in zip(grad_refs, names):
            for part, val in (("w", g_w), ("b", g_b)):
                if name == name_path + (part,):
                    accum_ref(ref, val, first)

    def dense_bwd(p, h_in, g_out):
        # DEFAULT matmul precision: XLA's autodiff uses it too, and HIGHEST
        # (6-pass fp32 emulation) costs ~3x MXU throughput — only the tiny
        # [S, S] compositing triangulars keep HIGHEST (composite_fwd/_bwd)
        return dense_bwd_prec(p, h_in, g_out, dtype=compute_dtype)

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
        if i in cfg.skips:
            g_h = g_h[:, x_dim:]
        g_pre = g_h * save["mask_pts"][i]
        gw, gb, g_h = dense_bwd(params["pts"][i], save["in_pts"][i], g_pre)
        accum(("pts", i), gw, gb)

    # ---- outputs ----
    weights_ref[:] = w
    accum_ref(sq_refs, loss_lanes_sum(l_rgb, l_disp, l_depth, R), first)


@partial(jax.jit, static_argnames=("cfg", "white_bkgd", "block_rays",
                                   "interpret", "compute_dtype"))
def fused_train_render_grads(
    params,
    cfg: NeRFMLPConfig,
    rays_o: jnp.ndarray,      # [R, 3]
    rays_d: jnp.ndarray,      # [R, 3]
    z_vals: jnp.ndarray,      # [R, S] (jittered outside)
    noise: jnp.ndarray,       # [R, S] sigma noise (zeros when raw_noise_std=0)
    t_rgb: jnp.ndarray,       # [R, 3]
    t_disp: jnp.ndarray,      # [R]
    t_depth: jnp.ndarray,     # [R]
    s_rgb: jnp.ndarray,       # [R] per-ray loss scales (see module docstring)
    s_disp: jnp.ndarray,      # [R]
    s_depth: jnp.ndarray,     # [R]
    white_bkgd: bool = False,
    block_rays: int = 32,
    interpret: bool = False,
    compute_dtype: str = "float32",
) -> Tuple[Dict[str, jnp.ndarray], dict]:
    """One fused render+loss+backward pass for the PE-MLP backbone.

    Returns ({weights [R,S], sq_rgb, sq_disp, sq_depth}, param-grads pytree).
    The sq_* are the loss SUMS as defined by the scale arrays (already
    normalized when s = 1/n); total loss = sq_rgb + sq_disp + sq_depth.

    `compute_dtype="bfloat16"` runs the MLP matmuls (fwd + bwd) on bf16
    operands with f32 accumulation and stores saved activations in bf16 —
    the TPU analog of the reference's default fp16 FullyFusedMLP
    (`DS_NeRF/run_nerf_helpers_tcnn.py:48-60`). Compositing, loss math, and
    gradient accumulation stay f32. Measured r5 (tools/bench_fused_train.py):
    bf16 is ~1.5% SLOWER end to end — XLA:TPU's DEFAULT-precision f32
    matmul already issues single bf16 MXU passes, so the casts only add
    VPU work; it stays an opt-in. block_rays=32 is the measured best
    (67.7k vs 66.2k rays/s at 16; 64 fails to compile — VMEM).
    """
    N, S = z_vals.shape
    blk = min(block_rays, N)
    n_blocks = -(-N // blk)
    pad = n_blocks * blk - N
    if pad:
        zpadc = lambda a, c: jnp.concatenate([a, jnp.zeros((pad, c), a.dtype)])
        rays_o = jnp.concatenate([rays_o, jnp.broadcast_to(rays_o[-1:], (pad, 3))])
        rays_d = jnp.concatenate([rays_d, jnp.broadcast_to(rays_d[-1:], (pad, 3))])
        z_vals = jnp.concatenate([z_vals, jnp.broadcast_to(z_vals[-1:], (pad, S))])
        noise = zpadc(noise, S)
        t_rgb = zpadc(t_rgb, 3)
        t_disp = jnp.concatenate([t_disp, jnp.zeros((pad,), t_disp.dtype)])
        t_depth = jnp.concatenate([t_depth, jnp.zeros((pad,), t_depth.dtype)])
        # zero scales on padded rays: no loss, no gradient
        s_rgb = jnp.concatenate([s_rgb, jnp.zeros((pad,), s_rgb.dtype)])
        s_disp = jnp.concatenate([s_disp, jnp.zeros((pad,), s_disp.dtype)])
        s_depth = jnp.concatenate([s_depth, jnp.zeros((pad,), s_depth.dtype)])

    leaves, names = _flatten_params(params)
    ray_spec = lambda c: pl.BlockSpec((blk, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    const_spec = lambda l: pl.BlockSpec(l.shape, lambda i, nd=l.ndim: (0,) * nd,
                                        memory_space=pltpu.VMEM)
    sq_spec = pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w_specs = [const_spec(l) for l in leaves]

    kern = partial(_train_kernel, cfg=cfg, white_bkgd=white_bkgd, names=names,
                   n_params=len(leaves),
                   compute_dtype=jnp.dtype(compute_dtype))
    out_shapes = (
        jax.ShapeDtypeStruct((n_blocks * blk, S), jnp.float32),   # weights
        jax.ShapeDtypeStruct((1, 128), jnp.float32),              # loss sums
    ) + tuple(jax.ShapeDtypeStruct(l.shape, jnp.float32) for l in leaves)
    out_specs = (ray_spec(S), sq_spec) + tuple(const_spec(l) for l in leaves)

    outs = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=(n_blocks,),
        in_specs=[ray_spec(3), ray_spec(3), ray_spec(S), ray_spec(S),
                  ray_spec(3), ray_spec(1), ray_spec(1), ray_spec(1),
                  ray_spec(1), ray_spec(1)] + w_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(rays_o, rays_d, z_vals, noise, t_rgb, t_disp[:, None], t_depth[:, None],
      s_rgb[:, None], s_disp[:, None], s_depth[:, None], *leaves)

    weights, sq = outs[0], outs[1]
    grad_leaves = outs[2:]
    grads = {"pts": [{} for _ in params["pts"]]}
    for leaf, name in zip(grad_leaves, names):
        if name[0] == "pts":
            grads["pts"][name[1]][name[2]] = leaf
        else:
            grads.setdefault(name[0], {})[name[1]] = leaf
    metrics = {
        "weights": weights[:N],
        "sq_rgb": sq[0, 0],
        "sq_disp": sq[0, 1],
        "sq_depth": sq[0, 2],
    }
    return metrics, grads
