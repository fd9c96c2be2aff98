#!/usr/bin/env python
"""Hash-grid encode kernel micro-benchmark (fwd + table-grad bwd).

Compares the XLA gather/scatter encode, the first-gen fused kernel
(ops/pallas_hashgrid.py), and the transposed kernel (ops/pallas_hashgrid_t.py)
at the canonical training load (131k points, 16 levels, F=2). Honest timing
through the tunneled TPU: chained scalar feedback + host value fetch.

Usage: python tools/bench_encode.py [log2_table_size] [n_points]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mvip_tpu.models.nerf_hashgrid import HashGridConfig, dense_levels, hashgrid_encode
from mvip_tpu.ops.pallas_hashgrid import MAX_FUSED_LOG2, hashgrid_encode_fused
from mvip_tpu.ops.pallas_hashgrid_t import hashgrid_encode_fused_t


def _time(fn, x, reps=10, warmup=2):
    s = jnp.zeros(())
    for _ in range(warmup):
        s = fn(x + s * 1e-20)
    float(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        s = fn(x + s * 1e-20)  # chain: each rep is a distinct execution
    float(s)
    return (time.perf_counter() - t0) / reps


def main():
    log2T = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    cdt = sys.argv[3] if len(sys.argv) > 3 else "float32"
    cfg = HashGridConfig(log2_table_size=log2T, bound=8.0)
    L, F, T = cfg.n_levels, cfg.n_features, cfg.table_size
    res_arr = jnp.asarray(cfg.resolutions, jnp.int32)
    dense = dense_levels(cfg.resolutions, T)
    dense_i = dense.astype(jnp.int32)

    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (L, T, F), jnp.float32, -1e-4, 1e-4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (N, L * F), jnp.float32)

    @jax.jit
    def xla_fwd(x):
        return jnp.sum(hashgrid_encode(table, x, res_arr, T, dense))

    @jax.jit
    def g1_fwd(x):
        return jnp.sum(hashgrid_encode_fused(table, x, res_arr, dense_i, T, compute_dtype=cdt))

    @jax.jit
    def g2_fwd(x):
        return jnp.sum(hashgrid_encode_fused_t(table, x, res_arr, dense_i, T, compute_dtype=cdt))

    @jax.jit
    def g2t_fwd(x):
        return jnp.sum(hashgrid_encode_fused_t(
            table, x, res_arr, dense_i, T, compute_dtype=cdt,
            res_static=cfg.resolutions))

    @jax.jit
    def g2t_fb(x):
        def loss(t):
            return jnp.sum(hashgrid_encode_fused_t(
                t, x, res_arr, dense_i, T, compute_dtype=cdt,
                res_static=cfg.resolutions) * g)
        return jnp.sum(jnp.abs(jax.grad(loss)(table)))

    @jax.jit
    def g1_fb(x):
        def loss(t):
            return jnp.sum(hashgrid_encode_fused(t, x, res_arr, dense_i, T, compute_dtype=cdt) * g)
        return jnp.sum(jnp.abs(jax.grad(loss)(table)))

    @jax.jit
    def g2_fb(x):
        def loss(t):
            return jnp.sum(hashgrid_encode_fused_t(t, x, res_arr, dense_i, T, compute_dtype=cdt) * g)
        return jnp.sum(jnp.abs(jax.grad(loss)(table)))

    # compiled-TPU correctness first (interpret-mode parity is in tests/)
    ref = hashgrid_encode(table, x[:4096], res_arr, T, dense)
    import numpy as np

    o2 = hashgrid_encode_fused_t(table, x[:4096], res_arr, dense_i, T, compute_dtype=cdt)
    atol = 1e-4 if cdt == "float32" else 2e-2
    np.testing.assert_allclose(np.asarray(o2), np.asarray(ref), atol=atol)
    print("compiled gen2 fwd parity vs XLA: OK")
    if log2T <= MAX_FUSED_LOG2:
        o1 = hashgrid_encode_fused(table, x[:4096], res_arr, dense_i, T, compute_dtype=cdt)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(ref), atol=atol)
        print("compiled gen1 fwd parity vs XLA: OK")

    o2t = hashgrid_encode_fused_t(table, x[:4096], res_arr, dense_i, T,
                                  compute_dtype=cdt,
                                  res_static=cfg.resolutions)
    np.testing.assert_allclose(np.asarray(o2t), np.asarray(ref), atol=atol)
    print("compiled gen2-trimmed fwd parity vs XLA: OK")

    results = {}
    results["gen2_fwd_ms"] = _time(g2_fwd, x) * 1e3
    results["gen2_fwd_bwd_ms"] = _time(g2_fb, x) * 1e3
    results["gen2_trim_fwd_ms"] = _time(g2t_fwd, x) * 1e3
    results["gen2_trim_fwd_bwd_ms"] = _time(g2t_fb, x) * 1e3
    if log2T <= MAX_FUSED_LOG2:
        results["gen1_fwd_ms"] = _time(g1_fwd, x) * 1e3
        results["gen1_fwd_bwd_ms"] = _time(g1_fb, x) * 1e3
    results["xla_fwd_ms"] = _time(xla_fwd, x, reps=3, warmup=1) * 1e3

    print(f"N={N} L={L} F={F} T=2^{log2T} compute_dtype={cdt}")
    for k, v in results.items():
        print(f"  {k}: {v:.2f}")


if __name__ == "__main__":
    main()
