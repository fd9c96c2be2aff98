#!/usr/bin/env python
"""Precision/block ablation of the fused-Pallas MLP train step (VERDICT r4
next #3: the headline sat at ~66k rays/s / mfu 0.23 for three rounds with no
bf16-compute attempt, while the reference default is an fp16 FullyFusedMLP,
`DS_NeRF/run_nerf_helpers_tcnn.py:48-60`).

Measures, on the canonical bench workload (N_rand=1024, 64+64 samples,
3-batch loss surface):

  1. a raw-matmul probe: DEFAULT-precision f32 vs explicit-bf16 operands —
     establishes whether XLA:TPU's DEFAULT f32 matmul already runs single
     bf16 MXU passes (in which case "bf16 compute" cannot speed the MXU work
     and any win must come from VMEM traffic);
  2. the full fused train step at compute_dtype x block_rays combinations.

Timing is honest per the repo protocol: each step consumes the donated state
of the previous (chained executions) and the loop closes with a host VALUE
fetch. Usage: python tools/bench_fused_train.py [iters]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

N_RAND, N_SAMPLES, N_IMPORTANCE = 1024, 64, 64
WARMUP = 8


def _scene():
    """Synthetic scene matching bench.py's _scene shapes (no disk deps)."""
    rng = np.random.default_rng(0)
    H, W, n = 100, 150, 4
    images = rng.uniform(0, 1, (n, H, W, 3)).astype(np.float32)
    masks = np.zeros((n, H, W), np.float32)
    masks[:, 30:60, 40:90] = 1
    depths = rng.uniform(2, 6, (n, H, W)).astype(np.float32)
    poses = np.tile(np.eye(4)[:3], (n, 1, 1)).astype(np.float32)
    poses[:, 2, 3] = 4.0
    return images, masks, depths, poses, 120.0


def bench_step(compute_dtype: str, block_rays: int, iters: int) -> float:
    from mvip_tpu.data.rays import build_ray_streams
    from mvip_tpu.models.nerf_mlp import NeRFMLPConfig, init_nerf_mlp
    from mvip_tpu.render.renderer import RenderOptions
    from mvip_tpu.train.fused_step import make_fused_train_step
    from mvip_tpu.train.state import create_train_state, make_optimizer
    from mvip_tpu.train.step import DeviceStreams, StepConfig

    images, masks, depths, poses, focal = _scene()
    streams = build_ray_streams(images, masks, depths, poses, focal)
    H, W = images.shape[1:3]
    mcfg = NeRFMLPConfig()
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(1), mcfg),
        "fine": init_nerf_mlp(jax.random.PRNGKey(2), mcfg),
    }
    ropts = RenderOptions(n_samples=N_SAMPLES, n_importance=N_IMPORTANCE,
                          perturb=1.0, lindisp=True, raw_noise_std=1.0,
                          white_bkgd=True)
    scfg = StepConfig(n_rand=N_RAND, depth_loss=True, depth_lambda=0.1,
                      near=1.2, far=7.7, H=H, W=W, focal=focal)
    optimizer = make_optimizer(3e-3, 10)
    state = create_train_state(params, optimizer)
    step = make_fused_train_step(scfg, ropts, mcfg, optimizer,
                                 block_rays=block_rays,
                                 compute_dtype=compute_dtype)
    ds = DeviceStreams.from_host(streams)

    key = jax.random.PRNGKey(0)
    for i in range(WARMUP):
        state, metrics = step(state, ds, jax.random.fold_in(key, i))
    loss0 = float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, ds, jax.random.fold_in(key, WARMUP + i))
    loss1 = float(metrics["loss"])
    dt = time.perf_counter() - t0
    rate = iters * N_RAND / dt
    print(f"  dtype={compute_dtype:<9} block={block_rays:<3} "
          f"{rate:>9,.0f} rays/s   (loss {loss0:.4f} -> {loss1:.4f})")
    return rate


def raw_matmul_probe(iters: int = 50):
    """[4096,256]x[256,256] — the fused kernel's layer shape at block 32."""
    m, k, n = 4096, 256, 256
    a32 = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
    b32 = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)

    def time_dot(a, b, label):
        f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
        out = f(a, b)
        s = float(out[0, 0])  # sync
        t0 = time.perf_counter()
        for i in range(iters):
            # distinct executions: perturb by the fetched scalar
            out = f(a + s * 1e-12, b)
            s = float(out[0, 0])
        dt = time.perf_counter() - t0
        tflops = iters * 2 * m * k * n / dt / 1e12
        print(f"  {label:<28} {dt / iters * 1e6:8.1f} us/call  {tflops:6.1f} TFLOPS")
        return dt / iters

    t_f32 = time_dot(a32, b32, "f32 DEFAULT precision")
    t_bf16 = time_dot(a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16),
                      "bf16 operands")
    print(f"  ratio f32/bf16 = {t_f32 / t_bf16:.2f} "
          f"(~1.0 => DEFAULT f32 already runs single bf16 MXU passes)")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    print(f"devices: {jax.devices()}")
    print("[raw matmul probe]")
    raw_matmul_probe()
    print("[fused train step: compute_dtype x block_rays]")
    rates = {}
    for dtype in ("float32", "bfloat16"):
        for blk in (16, 32, 64):
            try:
                rates[(dtype, blk)] = bench_step(dtype, blk, iters)
            except Exception as e:  # Mosaic compile failures at big blocks
                print(f"  dtype={dtype:<9} block={blk:<3} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}")
    if rates:
        best = max(rates, key=rates.get)
        print(f"best: dtype={best[0]} block={best[1]} -> {rates[best]:,.0f} rays/s")


if __name__ == "__main__":
    main()
