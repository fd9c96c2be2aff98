"""Benchmark the diffusion-guidance stack at REAL SD-1.5 scale on one chip.

The training probes in BASELINE.md run a tiny random-init SD stack (this image
has no real checkpoint, zero egress), so the guidance networks never dominate
there. In production they do: every MVIP step pays one CFG UNet pair per
active SDS branch plus VAE encodes (reference hot loop:
/root/reference/DS_NeRF/guidance/sd_utils.py:275-429). This tool measures the
real-scale cost with random weights — same shapes, same FLOPs, same layout —
so the production step time on TPU is a recorded, reproducible number.

Usage:
    python tools/bench_guidance.py            # real SD-1.5 scale (TPU)
    python tools/bench_guidance.py --tiny     # tiny configs (CPU smoke test)

Measures (median of `--iters` calls after one warm-up):
  * unet_cfg_b2     — 9-ch inpaint UNet, CFG pair (batch 2), 64x64 latents
  * unet_cfg_b10    — collaborative-SDS batch (5 neighbor views x CFG)
  * vae_encode_512  — VAE encode of a 512x512x3 render
  * vae_decode_64   — VAE decode of 64x64x4 latents
each in f32 and bf16 (the shipped SDS default, sds.py `compute_dtype`).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

if "--tiny" in sys.argv:
    # CPU smoke mode: the axon TPU plugin ignores JAX_PLATFORMS=cpu, so force
    # the platform via config before the backend initializes (same recipe as
    # tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

from mvip_tpu.guidance.unet import UNetConfig, apply_unet, init_unet, tiny_unet_config
from mvip_tpu.guidance.vae import VAEConfig, encode_moments, decode, init_vae, tiny_vae_config


def _time(fn, x, *args, iters: int) -> float:
    """Honest timing through the tunneled TPU (see tools/bench_encode.py):
    chained scalar feedback makes every rep a distinct execution (identical
    inputs return instantly from the remote cache) and the host value fetch
    is the only reliable completion barrier (`block_until_ready` returns
    before remote execution finishes)."""
    s = jnp.zeros((), x.dtype)
    s = jnp.mean(fn(x + s * 1e-20, *args))  # warm-up / compile
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = jnp.mean(fn(x + s * 1e-20, *args))
    float(s)
    return (time.perf_counter() - t0) * 1e3 / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny configs (CPU smoke)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--latent", type=int, default=64, help="latent side (64 = 512px)")
    args = ap.parse_args()

    if args.tiny:
        ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
        lat = 8
    else:
        ucfg, vcfg = UNetConfig(), VAEConfig()  # SD-1.5 inpaint scale
        lat = args.latent
    img = lat * vcfg.downscale

    k = jax.random.PRNGKey(0)
    ku, kv = jax.random.split(k)
    unet_params = init_unet(ku, ucfg)
    vae_params = init_vae(kv, vcfg)
    n_unet = sum(x.size for x in jax.tree.leaves(unet_params))
    n_vae = sum(x.size for x in jax.tree.leaves(vae_params))
    dev = jax.devices()[0]
    print(f"device={dev.platform} unet_params={n_unet/1e6:.1f}M vae_params={n_vae/1e6:.1f}M "
          f"latents={lat}x{lat} image={img}x{img}")

    ctx_dim = ucfg.cross_attention_dim
    results = {}
    for dtype_name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        uf = jax.jit(lambda p, x, t, c, d=dtype: apply_unet(p, ucfg, x, t, c, compute_dtype=d))
        for bs, tag in ((2, "unet_cfg_b2"), (10, "unet_cfg_b10")):
            x = jnp.zeros((bs, lat, lat, ucfg.in_channels))
            c = jnp.zeros((bs, 77, ctx_dim))
            t = jnp.full((bs,), 500, jnp.int32)
            ms = _time(lambda xx: uf(unet_params, xx, t, c), x, iters=args.iters)
            results[f"{tag}_{dtype_name}_ms"] = round(ms, 1)
            print(f"{tag:14s} {dtype_name:5s} {ms:8.1f} ms", flush=True)

        vp = (jax.tree.map(lambda a: a.astype(dtype), vae_params)
              if dtype is not None else vae_params)
        ef = jax.jit(lambda p, x: encode_moments(p, vcfg, x))
        xe = jnp.zeros((1, img, img, vcfg.in_channels), dtype or jnp.float32)
        ms = _time(lambda xx: ef(vp, xx), xe, iters=args.iters)
        results[f"vae_encode_{img}_{dtype_name}_ms"] = round(ms, 1)
        print(f"vae_encode_{img:<4d} {dtype_name:5s} {ms:8.1f} ms", flush=True)

        df = jax.jit(lambda p, z: decode(p, vcfg, z))
        zd = jnp.zeros((1, lat, lat, vcfg.latent_channels), dtype or jnp.float32)
        ms = _time(lambda zz: df(vp, zz), zd, iters=args.iters)
        results[f"vae_decode_{lat}_{dtype_name}_ms"] = round(ms, 1)
        print(f"vae_decode_{lat:<5d} {dtype_name:5s} {ms:8.1f} ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
