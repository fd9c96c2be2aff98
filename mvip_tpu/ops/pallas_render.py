"""Pallas TPU megakernel: fused embed -> PE-MLP eval -> alpha compositing.

The SURVEY §7.5(a) kernel: one pass over a [rays, samples] block computes the
positional encoding, the full 8x256 skip-MLP with view-direction branch, and
the transmittance compositing — all activations stay in VMEM, so none of the
[R*S, 256] layer activations (3.2GB of HBM traffic per 196k-point render in
the XLA formulation) ever round-trip through HBM.

Scope: deterministic FORWARD rendering (eval/video/testset paths — perturb=0,
raw_noise_std=0, the reference's `render_path` setting). Training keeps the
XLA path (autodiff); importance resampling reuses `sample_pdf_pallas`.

Layout notes:
- weights are passed as VMEM inputs, constant across the ray grid (Mosaic keeps
  them resident between grid steps);
- the exclusive transmittance cumsum runs as an upper-triangular matmul on the
  MXU (same trick as the fused sampler — Mosaic has no cumsum);
- the PE uses the framework's grouped order (ops/embed.py) — matching the
  training-time encoder, so trained params drop in unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvip_tpu.models.nerf_mlp import NeRFMLPConfig


def _pe(x, num_freqs):
    """Grouped-order positional encoding inside the kernel (VPU trig).

    Frequencies are a static constant — a float iota fails Mosaic verification.
    """
    # static scalar multiplies (no constant arrays — pallas_call forbids
    # captured consts; a float iota fails Mosaic verification)
    y = jnp.concatenate([x * float(2.0 ** i) for i in range(num_freqs)], -1)
    return jnp.concatenate([x, jnp.sin(y), jnp.cos(y)], -1)


def _dense(p, x):
    # weight rides the activation dtype (bf16 compute mode feeds bf16 x;
    # mixed bf16xf32 would promote the dot back to f32). Accumulation is
    # always f32 via preferred_element_type; the cast is a no-op for f32 x.
    return jnp.dot(x, p["w"].astype(x.dtype),
                   preferred_element_type=jnp.float32) + p["b"]


def _render_kernel(ro_ref, rd_ref, z_ref, noise_ref, *param_refs, rgb_ref,
                   disp_ref, acc_ref, depth_ref, weights_ref,
                   cfg: NeRFMLPConfig, white_bkgd: bool, names):
    params = _unflatten_params(param_refs, names)
    ro = ro_ref[:]                    # [R, 3]
    rd = rd_ref[:]                    # [R, 3]
    z = z_ref[:]                      # [R, S]
    noise = noise_ref[:]              # [R, S] sigma noise (zeros when off)
    R, S = z.shape

    pts = (ro[:, None, :] + rd[:, None, :] * z[..., None]).reshape(R * S, 3)
    vd = rd * jax.lax.rsqrt(jnp.sum(rd * rd, -1, keepdims=True))
    vd_pts = jnp.broadcast_to(vd[:, None, :], (R, S, 3)).reshape(R * S, 3)

    # --- PE-MLP forward (all activations VMEM-resident) ---
    x = _pe(pts, cfg.multires)
    h = x
    for i, layer in enumerate(params["pts"]):
        h = jax.nn.relu(_dense(layer, h))
        if i in cfg.skips:
            h = jnp.concatenate([x, h], -1)
    sigma = _dense(params["alpha"], h)[:, 0]
    feat = _dense(params["feature"], h)
    v = _pe(vd_pts, cfg.multires_views)
    h2 = jax.nn.relu(_dense(params["views"], jnp.concatenate([feat, v], -1)))
    rgb = jax.nn.sigmoid(_dense(params["rgb"], h2))         # [R*S, 3]

    sigma = jax.nn.relu(sigma.reshape(R, S) + noise)
    rgb = rgb.reshape(R, S, 3)

    # --- compositing (raw2outputs semantics, `run_nerf_helpers.py:350-404`) ---
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((R, 1), 1e10, z.dtype)], -1
    )
    dists = dists * jnp.sqrt(jnp.sum(rd * rd, -1, keepdims=True))
    alpha = 1.0 - jnp.exp(-sigma * dists)                   # [R, S]

    # exclusive cumsum of log(1-alpha) via strictly-lower-triangular MXU matmul
    log_t = jnp.log(jnp.clip(1.0 - alpha, 1e-10, 1.0))
    ki = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    tri = (ki < ji).astype(log_t.dtype)                     # strict: exclusive
    cum = jax.lax.dot_general(
        log_t, tri, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    transmittance = jnp.exp(cum)
    weights = alpha * transmittance                         # [R, S]

    rgb_map = jnp.sum(weights[..., None] * rgb, 1)          # [R, 3]
    depth = jnp.sum(weights * z, 1)
    acc = jnp.sum(weights, 1)
    mean_d = depth / jnp.maximum(acc, 1e-10)
    disp = jnp.where(acc > 1e-8, 1.0 / jnp.maximum(1e-10, mean_d), 0.0)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[:, None])

    rgb_ref[:] = rgb_map
    disp_ref[:] = disp[:, None]
    acc_ref[:] = acc[:, None]
    depth_ref[:] = depth[:, None]
    weights_ref[:] = weights


def _flatten_params(params):
    """dict -> (leaves, names) with a stable order the kernel can rebuild."""
    leaves, names = [], []
    for i, layer in enumerate(params["pts"]):
        for part in ("w", "b"):
            leaves.append(layer[part])
            names.append(("pts", i, part))
    for head in ("feature", "alpha", "views", "rgb"):
        for part in ("w", "b"):
            leaves.append(params[head][part])
            names.append((head, part))
    return leaves, tuple(names)


def _unflatten_params(refs, names):
    out = {"pts": {}}
    for ref, name in zip(refs, names):
        val = ref[:]
        if name[0] == "pts":
            out["pts"].setdefault(name[1], {})[name[2]] = val
        else:
            out.setdefault(name[0], {})[name[1]] = val
    out["pts"] = [out["pts"][i] for i in sorted(out["pts"])]
    return out


@partial(jax.jit, static_argnames=("cfg", "white_bkgd", "block_rays", "interpret"))
def fused_render_mlp(
    params,
    cfg: NeRFMLPConfig,
    rays_o: jnp.ndarray,    # [N, 3]
    rays_d: jnp.ndarray,    # [N, 3]
    z_vals: jnp.ndarray,    # [N, S] (jittered for training, det for eval)
    white_bkgd: bool = False,
    block_rays: int = 32,
    interpret: bool = False,
    noise: jnp.ndarray = None,  # [N, S] pre-relu sigma noise (raw_noise_std)
) -> Dict[str, jnp.ndarray]:
    """Fused forward render of the PE-MLP backbone. Returns rgb/disp/acc/depth."""
    N, S = z_vals.shape
    if noise is None:
        noise = jnp.zeros((N, S), z_vals.dtype)
    blk = min(block_rays, N)
    n_blocks = -(-N // blk)
    pad = n_blocks * blk - N
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.broadcast_to(rays_o[-1:], (pad, 3))])
        rays_d = jnp.concatenate([rays_d, jnp.broadcast_to(rays_d[-1:], (pad, 3))])
        z_vals = jnp.concatenate([z_vals, jnp.broadcast_to(z_vals[-1:], (pad, S))])
        noise = jnp.concatenate([noise, jnp.zeros((pad, S), noise.dtype)])

    leaves, names = _flatten_params(params)
    ray_spec = lambda c: pl.BlockSpec((blk, c), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec(l.shape, lambda i, nd=l.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for l in leaves
    ]
    kernel = partial(_render_kernel, cfg=cfg, white_bkgd=white_bkgd, names=names)

    def kern(ro, rd, z, noi, *ws_and_outs):
        ws = ws_and_outs[: len(leaves)]
        rgb, disp, acc, depth, weights = ws_and_outs[len(leaves):]
        kernel(ro, rd, z, noi, *ws, rgb_ref=rgb, disp_ref=disp, acc_ref=acc,
               depth_ref=depth, weights_ref=weights)

    out_shapes = (
        jax.ShapeDtypeStruct((n_blocks * blk, 3), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks * blk, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks * blk, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks * blk, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks * blk, S), jnp.float32),
    )
    rgb, disp, acc, depth, weights = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=(n_blocks,),
        in_specs=[ray_spec(3), ray_spec(3), ray_spec(S), ray_spec(S)] + w_specs,
        out_specs=(ray_spec(3), ray_spec(1), ray_spec(1), ray_spec(1),
                   ray_spec(S)),
        interpret=interpret,
    )(rays_o, rays_d, z_vals, noise, *leaves)
    return {
        "rgb": rgb[:N],
        "disp": disp[:N, 0],
        "acc": acc[:N, 0],
        "depth": depth[:N, 0],
        "weights": weights[:N],
    }


def fused_hierarchical_render(
    params_coarse,
    params_fine,
    cfg: NeRFMLPConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int,
    n_importance: int,
    lindisp: bool = False,
    white_bkgd: bool = False,
    block_rays: int = 32,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Fully fused deterministic eval render: coarse megakernel -> fused
    inverse-CDF sampler -> fine megakernel (the Pallas replacement for the
    reference's render_path hot loop, `run.py:1222-1362`)."""
    from mvip_tpu.ops.pallas_sampling import sample_pdf_pallas
    from mvip_tpu.ops.sampling import merge_z_vals, stratified_z_vals

    N = rays_o.shape[0]
    z = stratified_z_vals(None, N, n_samples, near, far, lindisp=lindisp,
                          perturb=0.0)
    coarse = fused_render_mlp(params_coarse, cfg, rays_o, rays_d, z,
                              white_bkgd=white_bkgd, block_rays=block_rays,
                              interpret=interpret)
    if n_importance <= 0:
        coarse["z_vals"] = z
        return coarse
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
    z_fine = sample_pdf_pallas(z_mid, coarse["weights"][:, 1:-1], n_importance,
                               det=True, interpret=interpret)
    z_all = merge_z_vals(z, z_fine)
    out = fused_render_mlp(params_fine, cfg, rays_o, rays_d, z_all,
                           white_bkgd=white_bkgd, block_rays=block_rays,
                           interpret=interpret)
    out.update(rgb0=coarse["rgb"], disp0=coarse["disp"], acc0=coarse["acc"],
               z_vals=z_all)
    return out


def fused_render_image(
    params_coarse,
    params_fine,
    cfg: NeRFMLPConfig,
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
    block_rays: int = 32,
    extras: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full-image deterministic render on the fused pipeline (eval fast path:
    1.9x the XLA hierarchical renderer on one v5e for 8192x(64+64)).
    `extras` adds the per-sample weights/z_vals/alpha maps for the render-tree
    dump (`run.py:1329-1343` directory contract)."""
    from mvip_tpu.ops.rays import rays_for_pose

    ro, rd = rays_for_pose(H, W, focal, c2w)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    outs = {"rgb": [], "disp": [], "acc": [], "depth": []}
    if extras:
        outs.update(weights=[], z_vals=[], alpha=[])
    n = ro.shape[0]
    for i in range(0, n, chunk):
        ret = fused_hierarchical_render(
            params_coarse, params_fine, cfg, ro[i : i + chunk], rd[i : i + chunk],
            near, far, n_samples, n_importance, lindisp=lindisp,
            white_bkgd=white_bkgd, block_rays=block_rays,
        )
        if extras:
            from mvip_tpu.ops.compositing import alpha_from_weights

            ret["alpha"] = alpha_from_weights(ret["weights"])
        for k in outs:
            outs[k].append(ret[k])
    return {k: jnp.concatenate(v).reshape(H, W, *v[0].shape[1:])
            for k, v in outs.items()}
