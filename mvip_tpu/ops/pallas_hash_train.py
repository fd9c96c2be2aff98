"""Fused TRAINING step kernels for the hash-grid backbone.

The shipped default backbone (`hashgrid_fused`, tcnn capability parity with
`DS_NeRF/run_nerf_helpers_tcnn.py:36-84`) trained through the XLA step at
~5.1k rays/s: the Pallas encode ran fused, but XLA autodiff still spilled
every tiny-MLP activation to HBM and paid unfused compositing/backward around
it. This module extends the `ops/pallas_train.py` in-kernel-loss design to the
hash grid — per model pass:

    transposed encode kernel (ops/pallas_hashgrid_t.py, forward)
      -> [N, L*F] features in HBM (16MB/pass — the one chain boundary)
    THIS kernel: sigma net -> SH color net -> compositing -> per-ray loss
      cotangents -> full backward to net grads + d_enc, everything
      VMEM-resident per ray block
      -> d_enc [N, L*F] in HBM
    transposed encode backward kernel -> table gradient

jax.grad never runs. Chaining through HBM on the [N, 32] feature array costs
~40us of bandwidth per pass — noise next to the ~100ms the XLA formulation
spent on activation spills + gather-heavy autodiff.

Mosaic-shaped design notes:
  * the sigma net's last layer produces [sigma | geo] in one matmul; its
    GRADIENT outputs are SPLIT (w cols 0 and 1:, b likewise) because Mosaic
    cannot lane-concatenate the narrow per-head cotangents — the wrapper
    reassembles the [64, 16] gradient in XLA;
  * the color net's first layer consumes concat(sh, geo); the kernel slices
    its weight statically and runs two matmuls (no in-kernel concat), with
    the w-gradient again emitted in two pieces;
  * SH(viewdirs) [R, 16] is computed OUTSIDE in XLA (a 16-way stack of narrow
    vectors is a banned lane-concat in Mosaic) and broadcast per sample
    in-kernel; it carries no parameter gradient.

Compositing forward/backward and the loss-cotangent assembly are shared with
the MLP train kernel (`pallas_train.composite_fwd/_bwd`, verified bit-exact
against jax.grad of the XLA renderer).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvip_tpu.ops.pallas_train import (
    accum_ref,
    composite_bwd,
    composite_fwd,
    dense_bwd_prec,
    loss_lanes_sum,
    mse_loss_cotangents,
)


def _flatten_nets(params):
    """sigma_net + color_net layer lists -> (leaves, names), stable order."""
    leaves, names = [], []
    for net in ("sigma_net", "color_net"):
        for i, layer in enumerate(params[net]):
            for part in ("w", "b"):
                leaves.append(layer[part])
                names.append((net, i, part))
    return leaves, tuple(names)


def _unflatten_nets(refs, names):
    out = {"sigma_net": {}, "color_net": {}}
    for ref, name in zip(refs, names):
        out[name[0]].setdefault(name[1], {})[name[2]] = ref[:]
    return {k: [v[i] for i in sorted(v)] for k, v in out.items()}


def nets_forward(nets, enc, sh_p, geo_dim, sh_dim, save=None):
    """sigma net -> split [sigma | geo] heads -> SH color net (first layer
    split over the (sh | geo) inputs — no in-kernel lane concat); optionally
    records residues for `nets_backward`. Shared by the train kernel here and
    the render kernels in `pallas_hash_render`."""
    s_layers, c_layers = nets["sigma_net"], nets["color_net"]

    def dense(p, x):
        return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]

    h = enc
    for i, layer in enumerate(s_layers):
        if save is not None:
            save.setdefault("sig_in", []).append(h)
        pre = dense(layer, h)
        if i < len(s_layers) - 1:
            h = jax.nn.relu(pre)
            if save is not None:
                save.setdefault("sig_mask", []).append(pre > 0)
    out1 = pre                                              # [P, 1+G]
    sigma_raw = out1[:, 0]
    geo = out1[:, 1:]                                       # [P, G]

    c0 = c_layers[0]
    w_sh = c0["w"][:sh_dim]                                 # [SH, H]
    w_geo = c0["w"][sh_dim:]                                # [G, H]
    pre_c = (
        jnp.dot(sh_p, w_sh, preferred_element_type=jnp.float32)
        + jnp.dot(geo, w_geo, preferred_element_type=jnp.float32)
        + c0["b"]
    )
    h = jax.nn.relu(pre_c)
    if save is not None:
        save["geo"] = geo
        save.setdefault("col_in", []).append(None)
        save.setdefault("col_mask", []).append(pre_c > 0)
    for i, layer in enumerate(c_layers[1:], start=1):
        if save is not None:
            save["col_in"].append(h)
        pre = dense(layer, h)
        if i < len(c_layers) - 1:
            h = jax.nn.relu(pre)
            if save is not None:
                save["col_mask"].append(pre > 0)
    rgb_raw = pre                                           # [P, 3]
    return sigma_raw, rgb_raw, w_geo


def nets_backward(nets, save, sh_p, w_geo, g_sigma, g_rgb_raw, gref, first):
    """Full network backward from (g_sigma [P,1], g_rgb_raw [P,3]) cotangents
    to accumulated grad refs; returns d_enc [P, E]. The split-head gradient
    layout (sigma-last / color-first pieces) matches `names_grads`. Shared by
    `_hash_train_kernel` and `pallas_hash_render._hash_render_bwd_kernel`."""
    s_layers, c_layers = nets["sigma_net"], nets["color_net"]

    # color net, last..second layers
    g = g_rgb_raw
    for i in reversed(range(1, len(c_layers))):
        gw, gb, g = dense_bwd_prec(c_layers[i], save["col_in"][i], g)
        accum_ref(gref[("color_net", i, "w")], gw, first)
        accum_ref(gref[("color_net", i, "b")], gb, first)
        g = g * save["col_mask"][i - 1]
    # color first layer: split input (sh has no params upstream; geo does)
    gw_sh = jax.lax.dot_general(sh_p, g, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    gw_geo = jax.lax.dot_general(save["geo"], g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    accum_ref(gref[("color0_w_sh",)], gw_sh, first)
    accum_ref(gref[("color0_w_geo",)], gw_geo, first)
    accum_ref(gref[("color_net", 0, "b")], jnp.sum(g, 0), first)
    g_geo = jax.lax.dot_general(g, w_geo, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [P, G]

    # sigma net last layer: [sigma | geo] heads kept separate (no lane concat)
    last = len(s_layers) - 1
    w_last = s_layers[last]["w"]                            # [H, 1+G]
    h_in = save["sig_in"][last]
    gw_s = jax.lax.dot_general(h_in, g_sigma, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)   # [H, 1]
    gw_g = jax.lax.dot_general(h_in, g_geo, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)   # [H, G]
    accum_ref(gref[("sigma_last_w_sigma",)], gw_s, first)
    accum_ref(gref[("sigma_last_w_geo",)], gw_g, first)
    accum_ref(gref[("sigma_last_b_sigma",)], jnp.sum(g_sigma, 0), first)
    accum_ref(gref[("sigma_last_b_geo",)], jnp.sum(g_geo, 0), first)
    g_h = (
        jax.lax.dot_general(g_sigma, w_last[:, 0:1], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(g_geo, w_last[:, 1:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    )
    for i in reversed(range(last)):
        g_pre = g_h * save["sig_mask"][i]
        gw, gb, g_h = dense_bwd_prec(s_layers[i], save["sig_in"][i], g_pre)
        accum_ref(gref[("sigma_net", i, "w")], gw, first)
        accum_ref(gref[("sigma_net", i, "b")], gb, first)
    return g_h


def _hash_train_kernel(rd_ref, z_ref, noise_ref, sh_ref, enc_ref, trgb_ref,
                       tdisp_ref, tdepth_ref, srgb_ref, sdisp_ref, sdepth_ref,
                       *refs, n_params: int, names, geo_dim: int, sh_dim: int,
                       white_bkgd: bool):
    param_refs = refs[:n_params]
    weights_ref = refs[n_params]
    sq_ref = refs[n_params + 1]
    denc_ref = refs[n_params + 2]
    grad_refs = refs[n_params + 3:]
    nets = _unflatten_nets(param_refs, names)

    rd = rd_ref[:]
    z = z_ref[:]
    noise = noise_ref[:]
    R, S = z.shape
    P = R * S
    enc = enc_ref[:]                                        # [P, E]
    sh = sh_ref[:]                                          # [R, SH]
    sh_p = jnp.broadcast_to(sh[:, None, :], (R, S, sh_dim)).reshape(P, sh_dim)

    save = {}
    sigma_raw, rgb_raw, w_geo = nets_forward(
        nets, enc, sh_p, geo_dim, sh_dim, save
    )

    # ---- composite + loss (shared with the MLP train kernel) ----
    sigma_noisy = sigma_raw.reshape(R, S) + noise
    sigma = jax.nn.relu(sigma_noisy)
    c = jax.nn.sigmoid(rgb_raw).reshape(R, S, 3)
    out, resid = composite_fwd(z, rd, sigma, c, white_bkgd)
    w = out["weights"]

    (l_rgb, l_disp, l_depth), (g_rgb, g_disp, g_depth) = mse_loss_cotangents(
        out, trgb_ref[:], tdisp_ref[:, 0], tdepth_ref[:, 0],
        srgb_ref[:, 0], sdisp_ref[:, 0], sdepth_ref[:, 0],
    )
    sigmabar, cbar = composite_bwd(
        z, w, c, sigma_noisy, out, resid, g_rgb, g_disp, g_depth,
        jnp.zeros_like(g_depth), white_bkgd,
    )
    g_sigma = sigmabar.reshape(P, 1)
    g_rgb_raw = cbar.reshape(P, 3)

    # ---- backward (shared helper) ----
    first = pl.program_id(0) == 0
    gref = {name: ref for name, ref in zip(names_grads(names), grad_refs)}
    g_h = nets_backward(nets, save, sh_p, w_geo, g_sigma, g_rgb_raw, gref,
                        first)

    # ---- outputs ----
    weights_ref[:] = w
    accum_ref(sq_ref, loss_lanes_sum(l_rgb, l_disp, l_depth, R), first)
    denc_ref[:] = g_h                                       # d loss / d enc


def names_grads(names) -> Tuple:
    """Gradient-output name list: net layers with the sigma-last / color-first
    leaves replaced by their split pieces (see module docstring)."""
    out = []
    s_idx = max(i for (net, i, _) in names if net == "sigma_net")
    for name in names:
        net, i, part = name
        if net == "sigma_net" and i == s_idx:
            if part == "w":
                out += [("sigma_last_w_sigma",), ("sigma_last_w_geo",)]
            else:
                out += [("sigma_last_b_sigma",), ("sigma_last_b_geo",)]
        elif net == "color_net" and i == 0 and part == "w":
            out += [("color0_w_sh",), ("color0_w_geo",)]
        else:
            out.append(name)
    return tuple(out)


def reassemble_net_grads(names, gleaves):
    """Rebuild the {sigma_net, color_net} layer-list gradient pytree from the
    split kernel outputs (concat is free out here in XLA)."""
    s_idx = max(i for (net, i, _) in names if net == "sigma_net")
    grads = {"sigma_net": [], "color_net": []}
    for i in range(s_idx + 1):
        if i == s_idx:
            grads["sigma_net"].append({
                "w": jnp.concatenate(
                    [gleaves[("sigma_last_w_sigma",)],
                     gleaves[("sigma_last_w_geo",)]], axis=1),
                "b": jnp.concatenate(
                    [gleaves[("sigma_last_b_sigma",)],
                     gleaves[("sigma_last_b_geo",)]]),
            })
        else:
            grads["sigma_net"].append({
                "w": gleaves[("sigma_net", i, "w")],
                "b": gleaves[("sigma_net", i, "b")],
            })
    n_color = max(i for (net, i, _) in names if net == "color_net") + 1
    for i in range(n_color):
        if i == 0:
            grads["color_net"].append({
                "w": jnp.concatenate(
                    [gleaves[("color0_w_sh",)], gleaves[("color0_w_geo",)]],
                    axis=0),
                "b": gleaves[("color_net", 0, "b")],
            })
        else:
            grads["color_net"].append({
                "w": gleaves[("color_net", i, "w")],
                "b": gleaves[("color_net", i, "b")],
            })
    return grads


def _grad_shapes(leaves, names, geo_dim, sh_dim):
    shapes = []
    s_idx = max(i for (net, i, _) in names if net == "sigma_net")
    for leaf, name in zip(leaves, names):
        net, i, part = name
        if net == "sigma_net" and i == s_idx:
            if part == "w":
                H = leaf.shape[0]
                shapes += [(H, 1), (H, geo_dim)]
            else:
                shapes += [(1,), (geo_dim,)]
        elif net == "color_net" and i == 0 and part == "w":
            H = leaf.shape[1]
            shapes += [(sh_dim, H), (geo_dim, H)]
        else:
            shapes.append(leaf.shape)
    return shapes


@partial(jax.jit, static_argnames=("geo_dim", "sh_dim", "white_bkgd",
                                   "block_rays", "interpret"))
def hash_mlp_train_grads(
    net_params,               # {"sigma_net": [...], "color_net": [...]}
    rd: jnp.ndarray,          # [R, 3]
    z_vals: jnp.ndarray,      # [R, S]
    noise: jnp.ndarray,       # [R, S]
    sh: jnp.ndarray,          # [R, sh_dim] SH(viewdirs), no grad path
    enc: jnp.ndarray,         # [R*S, E] hash-grid features
    t_rgb: jnp.ndarray,
    t_disp: jnp.ndarray,
    t_depth: jnp.ndarray,
    s_rgb: jnp.ndarray,
    s_disp: jnp.ndarray,
    s_depth: jnp.ndarray,
    geo_dim: int,
    sh_dim: int,
    white_bkgd: bool = False,
    block_rays: int = 16,
    interpret: bool = False,
):
    """One fused MLP+composite+loss+backward pass for the hash-grid nets.

    Returns ({weights, sq_rgb, sq_disp, sq_depth}, d_enc [R*S, E], net grads).
    """
    N, S = z_vals.shape
    E = enc.shape[-1]
    blk = min(block_rays, N)
    n_blocks = -(-N // blk)
    pad = n_blocks * blk - N
    if pad:
        zpadc = lambda a, c: jnp.concatenate([a, jnp.zeros((pad, c), a.dtype)])
        rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (pad, 3))])
        z_vals = jnp.concatenate([z_vals, jnp.broadcast_to(z_vals[-1:], (pad, S))])
        noise = zpadc(noise, S)
        sh = jnp.concatenate([sh, jnp.broadcast_to(sh[-1:], (pad, sh.shape[1]))])
        enc = jnp.concatenate([enc, jnp.zeros((pad * S, E), enc.dtype)])
        t_rgb = zpadc(t_rgb, 3)
        t_disp = jnp.concatenate([t_disp, jnp.zeros((pad,))])
        t_depth = jnp.concatenate([t_depth, jnp.zeros((pad,))])
        s_rgb = jnp.concatenate([s_rgb, jnp.zeros((pad,))])   # zero scales:
        s_disp = jnp.concatenate([s_disp, jnp.zeros((pad,))])  # no loss, no grad
        s_depth = jnp.concatenate([s_depth, jnp.zeros((pad,))])

    leaves, names = _flatten_nets(net_params)
    gnames = names_grads(names)
    gshapes = _grad_shapes(leaves, names, geo_dim, sh_dim)

    ray_spec = lambda c: pl.BlockSpec((blk, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    pt_spec = pl.BlockSpec((blk * S, E), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    const_spec = lambda shp: pl.BlockSpec(shp, lambda i, nd=len(shp): (0,) * nd,
                                          memory_space=pltpu.VMEM)
    sq_spec = pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)

    kern = partial(_hash_train_kernel, n_params=len(leaves), names=names,
                   geo_dim=geo_dim, sh_dim=sh_dim, white_bkgd=white_bkgd)
    out_shapes = (
        jax.ShapeDtypeStruct((n_blocks * blk, S), jnp.float32),      # weights
        jax.ShapeDtypeStruct((1, 128), jnp.float32),                 # loss sums
        jax.ShapeDtypeStruct((n_blocks * blk * S, E), jnp.float32),  # d_enc
    ) + tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in gshapes)
    out_specs = (ray_spec(S), sq_spec, pt_spec) + tuple(
        const_spec(s) for s in gshapes
    )

    outs = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=(n_blocks,),
        in_specs=[ray_spec(3), ray_spec(S), ray_spec(S),
                  ray_spec(sh.shape[1]), pt_spec, ray_spec(3), ray_spec(1),
                  ray_spec(1), ray_spec(1), ray_spec(1), ray_spec(1)]
                 + [const_spec(l.shape) for l in leaves],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(rd, z_vals, noise, sh, enc, t_rgb, t_disp[:, None], t_depth[:, None],
      s_rgb[:, None], s_disp[:, None], s_depth[:, None], *leaves)

    weights, sq, d_enc = outs[0], outs[1], outs[2]
    grads = reassemble_net_grads(names, dict(zip(gnames, outs[3:])))

    metrics = {
        "weights": weights[:N],
        "sq_rgb": sq[0, 0],
        "sq_disp": sq[0, 1],
        "sq_depth": sq[0, 2],
    }
    return metrics, d_enc[: N * S], grads


def hash_fused_render_grads(
    params,                   # {"table", "sigma_net", "color_net"}
    hcfg,                     # HashGridConfig
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    noise: jnp.ndarray,
    t_rgb, t_disp, t_depth, s_rgb, s_disp, s_depth,
    white_bkgd: bool = False,
    block_rays: int = 16,
    interpret: bool = False,
):
    """Full fused render+loss+backward for the hash-grid backbone: transposed
    encode kernel -> MLP/composite/loss/backward kernel -> transposed table-
    gradient kernel. Same contract as `pallas_train.fused_train_render_grads`.
    """
    import numpy as np

    from mvip_tpu.models.nerf_hashgrid import dense_levels, sh_encoding
    from mvip_tpu.ops.pallas_hashgrid_t import (
        _encode_bwd_table_t,
        _encode_fwd_t,
    )

    R, S = z_vals.shape
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    x01 = jnp.clip(
        (pts.reshape(-1, 3) + hcfg.bound) / (2.0 * hcfg.bound), 0.0, 1.0
    )
    res_arr = jnp.asarray(hcfg.resolutions, jnp.int32)
    dense_i = dense_levels(hcfg.resolutions, hcfg.table_size).astype(jnp.int32)
    table = params["table"].astype(jnp.float32)

    from mvip_tpu.ops.pallas_hashgrid_s import sorted_encode_active

    use_sorted = sorted_encode_active(hcfg)
    if use_sorted:
        # sorted-slab (gen-3) encode: T-independent gather cost; the forward
        # residuals (sorted queries + rank + overflow flag) feed the backward
        from mvip_tpu.ops.pallas_hashgrid_s import _sorted_bwd_table, _sorted_fwd

        enc, enc_res = _sorted_fwd(table, x01, res_arr, dense_i,
                                   table_size=hcfg.table_size,
                                   interpret=interpret)
    else:
        enc = _encode_fwd_t(table, x01, res_arr, dense_i,
                            table_size=hcfg.table_size, block=hcfg.fused_block,
                            compute_dtype=hcfg.fused_dtype, interpret=interpret,
                            res_static=hcfg.resolutions)
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    sh = sh_encoding(vd, hcfg.sh_degree)

    nets = {"sigma_net": params["sigma_net"], "color_net": params["color_net"]}
    metrics, d_enc, net_grads = hash_mlp_train_grads(
        nets, rays_d, z_vals, noise, sh, enc,
        t_rgb, t_disp, t_depth, s_rgb, s_disp, s_depth,
        geo_dim=hcfg.geo_feat_dim, sh_dim=hcfg.sh_dim,
        white_bkgd=white_bkgd, block_rays=block_rays, interpret=interpret,
    )
    if use_sorted:
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
    return metrics, grads
