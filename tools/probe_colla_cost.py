#!/usr/bin/env python
"""Micro-probe: where does the collaborative-SDS phase spend its ~1.0 s/step?

Times the colla phase's three non-render components in isolation on the
real guidance stack shapes (tiny SD, bf16, batch N=10 views at the
reference's factor-8 render size -> 512^2 VAE input -> 64^2 latents):
  resize   : bilinear [N,94,63,3] -> [N,512,512,3], fwd + VJP
  vae      : VAE encode fwd + VJP (the only differentiated guidance net)
  unet     : batch-2N CFG UNet pair, forward only (SDS grad is analytic)

Honest tunnel timing: value-fetch fences + a chained scalar so no two reps
share inputs. Run on a QUIET host. Prints one JSON line per component.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, args0, iters, chain_idx=0):
    import jax

    out = fn(*args0)
    s = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # warm + fence
    t0 = time.perf_counter()
    for i in range(iters):
        args = list(args0)
        args[chain_idx] = args[chain_idx] + (s * 1e-20 + i * 1e-12)
        out = fn(*args)
        s = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_views", type=int, default=10)
    ap.add_argument("--hc", type=int, default=94)
    ap.add_argument("--wc", type=int, default=63)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--sd_size", default="tiny")
    ap.add_argument("--with_f32", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mvip_tpu.config import load_config
    from mvip_tpu.guidance.layers import resize_bilinear
    from mvip_tpu.guidance.unet import apply_unet
    from mvip_tpu.guidance.vae import encode as vae_encode
    from mvip_tpu.train.guidance_setup import build_guidance

    cfg = load_config(["--config", "configs/spinnerf_scene1_full.txt",
                       "--sd_size", args.sd_size])
    gm, mcfg, (s_rgb, s_nrm, s_col), pair_rgb, pair_nrm = build_guidance(cfg)
    N, Hc, Wc = args.n_views, args.hc, args.wc
    size = s_col.latent_size * 8
    lat = s_col.latent_size
    dt = s_col.compute_dtype
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (N, Hc, Wc, 3), jnp.float32)

    # 1. resize fwd+vjp
    def f_resize(x):
        y, vjp = jax.vjp(lambda z: resize_bilinear(z, size, size), x)
        (gx,) = vjp(jnp.ones_like(y))
        return y.sum() + gx.sum()

    t_resize = _timeit(jax.jit(f_resize), [imgs], args.iters)

    big = jax.random.uniform(key, (N, size, size, 3), jnp.float32)

    # 2. vae encode fwd+vjp (the only differentiated guidance net), f32 vs
    # the production compute dtype
    def make_f_vae(cdt):
        def f_vae(x):
            def enc(z):
                return vae_encode(gm.vae_params, gm.vae_cfg, z * 2.0 - 1.0,
                                  jax.random.PRNGKey(1), compute_dtype=cdt)

            y, vjp = jax.vjp(enc, x)
            (gx,) = vjp(jnp.ones_like(y))
            return y.sum() + gx.sum()

        return f_vae

    # NOTE: the f32 variant (compute_dtype=None) of this VJP crashes the
    # remote tpu_compile_helper (HTTP 500) at batch 10 — gate it off by
    # default; --with_f32 re-enables for debugging.
    t_vae_f32 = (_timeit(jax.jit(make_f_vae(None)), [big], args.iters)
                 if args.with_f32 else -1.0)
    t_vae = _timeit(jax.jit(make_f_vae(dt)), [big], args.iters)

    # 3. batch-2N CFG UNet pair, forward only
    lats = jax.random.normal(key, (N, lat, lat, 4), jnp.float32)
    uncond, cond = pair_rgb[0], pair_rgb[1]
    te = jnp.concatenate(
        [jnp.broadcast_to(uncond, (N, *uncond.shape)),
         jnp.broadcast_to(cond, (N, *cond.shape))], 0
    )
    # 9-channel inpaint UNet input: latents + mask + masked-image latents
    m_lat = jnp.ones((N, lat, lat, 1), jnp.float32)

    def f_unet(z):
        zz = jnp.concatenate([z, z], 0)
        mm = jnp.concatenate([m_lat, m_lat], 0)
        x_in = jnp.concatenate([zz, mm, zz], -1).astype(dt)
        t = jnp.full((2 * N,), 500, jnp.int32)
        eps = apply_unet(gm.unet_params, gm.unet_cfg, x_in, t, te.astype(dt))
        return eps.astype(jnp.float32).sum()

    t_unet = _timeit(jax.jit(f_unet), [lats], args.iters)

    print(json.dumps({
        "n_views": N, "vae_input": size, "latent": lat,
        "sd_size": args.sd_size,
        "resize_fwd_vjp_sec": round(t_resize, 4),
        "vae_encode_fwd_vjp_f32_sec": round(t_vae_f32, 4),
        "vae_encode_fwd_vjp_sec": round(t_vae, 4),
        "unet_cfg_fwd_sec": round(t_unet, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
