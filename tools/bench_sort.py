#!/usr/bin/env python
"""Measure jax.lax.sort at the shapes the sorted-slab hash-grid encode needs.

The gen-3 encode idea (VERDICT r2 item 4: break the linear-in-T gather cost at
T=2^19) sorts each level's 8N corner queries so the one-hot gather matmul can
run against a ~2048-entry table slab instead of all T entries (~256x fewer
MACs). The price is ~3 sorts per level per train step:

  sort1: key = corner index  (u32), payloads (w f32, iota i32)   [fwd]
  sort3: key = perm          (i32), payloads (F feats, iota)      [fwd unsort]
  sort4: key = rank          (i32), payloads (F dup'd cotangents) [bwd]

Canonical load: N = 131072 pts -> 8N = 1,048,576 queries per level, 16 levels
batched as [16, 1M]. The whole design is viable only if a batched 3-payload
sort costs ~1 ms per level-row or less (total sort budget ~40 ms vs the
60 ms fwd+bwd target); this script answers that with honest tunnel-safe
timing (value-fetch chaining per the repo verify skill).

Usage: python tools/bench_sort.py [n_queries_log2=20] [levels=16] [reps=10]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, reps, fetch):
    out = fn(*args)
    fetch(out)  # compile + warm
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(reps):
        out = fn(*args)
        s += fetch(out)  # host VALUE fetch -> the tunnel cannot lie
    dt = (time.perf_counter() - t0) / reps
    return dt, s


def main():
    qlog = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    Q = 1 << qlog
    print(f"jax {jax.__version__} devices={jax.devices()}  shape=[{L}, {Q}]")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    idx = jax.random.randint(ks[0], (L, Q), 0, 1 << 19, jnp.int32)
    w = jax.random.uniform(ks[1], (L, Q), jnp.float32)
    f0 = jax.random.uniform(ks[2], (L, Q), jnp.float32)
    f1 = jax.random.uniform(ks[3], (L, Q), jnp.float32)
    iota = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None], (L, Q))

    # distinct data each rep via a chained scalar so every call really executes
    def fetch_first(out):
        return float(out[0][0, 0])

    @jax.jit
    def key_only(k, s):
        return (jax.lax.sort((k + s.astype(jnp.int32),), dimension=1,
                             num_keys=1)[0],)

    @jax.jit
    def key_2pay(k, s):
        o = jax.lax.sort((k + s.astype(jnp.int32), w, iota), dimension=1,
                         num_keys=1)
        return o

    @jax.jit
    def key_3pay(k, s):
        o = jax.lax.sort((k + s.astype(jnp.int32), w, f0, f1), dimension=1,
                         num_keys=1)
        return o

    @jax.jit
    def argsort_only(k, s):
        return (jnp.argsort(k + s.astype(jnp.int32), axis=1),)

    s = jnp.zeros((), jnp.float32)
    rows = {}
    for name, fn in (("key_only", key_only), ("key+2payload", key_2pay),
                     ("key+3payload", key_3pay), ("argsort", argsort_only)):
        dt, chk = timed(lambda k, ss: fn(k, ss), (idx, s), reps, fetch_first)
        rows[name] = dt * 1e3
        print(f"{name:14s} {dt*1e3:8.2f} ms   ({dt*1e3/L:6.3f} ms/level-row)")
        s = s + jnp.float32(chk) * 1e-9

    # decision line: 3 sorts/level/step -> total sort cost per train step
    per_step = rows["key+2payload"] + rows["key+3payload"] * 2
    print(f"\nprojected sort cost per train step (sort1 + sort3 + sort4): "
          f"{per_step:.1f} ms  (budget: ~40 ms for the 60 ms fwd+bwd target; "
          f"current 2^19 encode pair: 307 ms)")


if __name__ == "__main__":
    main()
