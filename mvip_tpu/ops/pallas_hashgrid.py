"""Pallas TPU fused hash-grid encoder — the MXU-gather instant-NGP path.

The reference's default backbone is tiny-cuda-nn's HashGrid encoding
(`DS_NeRF/run_nerf_helpers_tcnn.py:36-47`), a CUDA kernel built around the
GPU's fast random-access gathers and atomic scatter-adds. TPUs have neither:
XLA executes the 8-corner table gather at ~100M rows/s and the backward
scatter-add at ~16M rows/s (measured, one v5e), which makes the straight
translation (`models/nerf_hashgrid.py`, `hashgrid_encode`) ~50x slower per
point than the dense backbones. This module is the TPU-native redesign of
that kernel pair:

  * the gather is reformulated for the MXU: per corner, a one-hot
    [points, T/RE] matrix multiplied against the table laid out as
    [T/RE, 128] "lane blocks"
    (RE = 128//F entries per block row) selects each corner's block row, and
    an in-vreg lane gather (`tpu.dynamic_gather`, via take_along_axis on the
    128-lane axis — the one shape Mosaic supports) picks the entry's F
    features out of the row;
  * the backward scatter-add becomes the transposed one-hot matmul
    accumulated in a VMEM-resident [T/RE, 128] block across point blocks —
    no atomics, no serialization;
  * all 16 levels run in one kernel, grid (levels, point-blocks), with the
    per-level table block staying VMEM-resident across the inner point loop.

The one-hot matmul costs O(points * T) MXU work, so this path is for tables
that fit VMEM alongside their one-hot slabs: log2_table_size <= 16. At the
canonical workload (131k points, 16 levels, F=2) and T=2^14 it runs the
encode forward in ~25 ms and the table-gradient backward in ~35 ms vs
~1.2 s for the XLA gather/scatter formulation at the reference's T=2^19 —
with identical hashing semantics (`_hash_corners` in models/nerf_hashgrid.py,
mirroring tcnn's spatial hash and instant-NGP's dense-below-hash rule).

Gradients w.r.t. positions are exact, computed through the XLA encode's VJP
(a gather-only program — the TPU-hostile scatter exists only in the table
gradient). XLA dead-code-eliminates that branch in the training step, where
sample positions carry no parameter dependence (same argument as
ops/pallas_render_grad.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRIMES_I32 = (
    np.int32(1),
    np.int32(np.uint32(2654435761).astype(np.int32)),
    np.int32(np.uint32(805459861).astype(np.int32)),
)

MAX_FUSED_LOG2 = 16  # one-hot slab cost grows linearly in T; past 2^16 use XLA


def _corner_geometry(x, res, B):
    """Shared index/weight math: positions block [B, 3] -> per-corner
    (cx, cy, cz int coords [B, 8], trilinear weights [B, 8], frac [B, 3]).

    Exactly `hashgrid_encode`'s floor/frac/corner rule so the fused and XLA
    paths are interchangeable. The floor is clamped to res-1 so clipped
    boundary points (x == 1.0) keep corner coords <= res — otherwise dense
    indices exceed the (res+1)^3 range and alias after `& (T-1)` (frac
    becomes 1.0 there: the exact trilinear boundary value)."""
    pos = x * res.astype(jnp.float32)
    ipos = jnp.minimum(jnp.floor(pos).astype(jnp.int32), res - 1)
    frac = pos - ipos.astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (B, 8), 1)
    ox, oy, oz = (k >> 2) & 1, (k >> 1) & 1, k & 1
    cx = ipos[:, 0:1] + ox
    cy = ipos[:, 1:2] + oy
    cz = ipos[:, 2:3] + oz
    wx = jnp.where(ox > 0, frac[:, 0:1], 1.0 - frac[:, 0:1])
    wy = jnp.where(oy > 0, frac[:, 1:2], 1.0 - frac[:, 1:2])
    wz = jnp.where(oz > 0, frac[:, 2:3], 1.0 - frac[:, 2:3])
    return (cx, cy, cz), wx * wy * wz, frac, (ox, oy, oz)


def _corner_indices(corners, res, use_dense, T):
    """(cx, cy, cz) [B, 8] -> table indices [B, 8]; tcnn's dense-or-hash rule
    (models/nerf_hashgrid.py `_hash_corners`).

    T is a power of two (log2_table_size config), so the wraps are `& (T-1)`
    — identical to jnp.remainder's nonnegative result in two's complement,
    and far cheaper than the VPU's integer-modulo expansion."""
    cx, cy, cz = corners
    res1 = res + 1
    dense_idx = (cx * res1 + cy) * res1 + cz
    h = cx * _PRIMES_I32[0] ^ cy * _PRIMES_I32[1] ^ cz * _PRIMES_I32[2]
    return jnp.where(use_dense > 0, dense_idx & (T - 1), h & (T - 1))


def _gather_rows_c(tbl, hi_c, B, BT, compute_dtype):
    """One-hot MXU gather of one corner's block rows: [B, 128].

    (One matmul per corner: Mosaic crashes on both narrow-vector concats and
    sublane slices of a stacked-matmul result, so the 8 corners stay separate.)
    """
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, BT), 1)
    onehot = (rows_iota == hi_c).astype(compute_dtype)       # [B, BT]
    return jax.lax.dot_general(
        onehot, tbl.astype(compute_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, 128]


def _lane_select(rows_c, lo_c, F, B):
    """Pick the F features of entry `lo_c` out of each 128-lane block row.

    rows_c [B, 128] (one corner), lo_c [B, 1] -> feats [B, F] via an in-vreg
    lane gather (indices must span all 128 lanes for Mosaic; sliced after).
    Per-corner because Mosaic cannot concatenate narrow (1-lane) vectors."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    li = lo_c * F + (lane & (F - 1))  # F divides 128 => power of two
    return jnp.take_along_axis(rows_c, li, axis=1)[:, :F]


def _fwd_kernel(res_ref, dense_ref, x_ref, tbl_ref, out_ref, *, T, F, BT,
                compute_dtype):
    RE = 128 // F
    lvl = pl.program_id(0)
    res = res_ref[lvl]
    use_dense = dense_ref[lvl]
    x = x_ref[:]
    B = x.shape[0]
    corners, w, _, _ = _corner_geometry(x, res, B)
    idx = _corner_indices(corners, res, use_dense, T)
    # RE = 128/F is a power of two: shift/mask instead of int div/mod
    hi, lo = idx >> RE.bit_length() - 1, idx & (RE - 1)
    tbl = tbl_ref[0]
    acc = jnp.zeros((B, F), jnp.float32)
    for c in range(8):
        rows_c = _gather_rows_c(tbl, hi[:, c:c + 1], B, BT, compute_dtype)
        feats = _lane_select(rows_c, lo[:, c:c + 1], F, B)
        acc = acc + w[:, c:c + 1] * feats
    out_ref[0] = acc


def _bwd_table_kernel(res_ref, dense_ref, x_ref, g_ref, out_ref, *, T, F, BT,
                      compute_dtype):
    RE = 128 // F
    lvl = pl.program_id(0)
    blk = pl.program_id(1)
    res = res_ref[lvl]
    use_dense = dense_ref[lvl]
    x = x_ref[:]
    B = x.shape[0]
    corners, w, _, _ = _corner_geometry(x, res, B)
    idx = _corner_indices(corners, res, use_dense, T)
    hi, lo = idx >> RE.bit_length() - 1, idx & (RE - 1)

    g = g_ref[0]                                            # [B, F]
    # per-corner: spread the weighted cotangent onto the entry's lanes, then
    # scatter-by-transposed-one-hot on the MXU
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, BT), 1)
    acc = jnp.zeros((BT, 128), jnp.float32)
    for c in range(8):
        base = lo[:, c:c + 1] * F
        grow_c = jnp.zeros((B, 128), jnp.float32)
        for f in range(F):
            grow_c = grow_c + jnp.where(
                lane == base + f, w[:, c:c + 1] * g[:, f:f + 1], 0.0
            )
        onehot = (rows_iota == hi[:, c:c + 1]).astype(compute_dtype)
        acc = acc + jax.lax.dot_general(
            onehot, grow_c.astype(compute_dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BT, 128]

    @pl.when(blk == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] = out_ref[0] + acc


def _pad_rows(a, block):
    """Zero-pad a [N, C] array to a multiple of `block` rows.

    THE padding rule for every kernel in this module (forward and backwards
    must agree on the point-block layout). Returns (padded, NB, pad)."""
    N = a.shape[0]
    NB = -(-N // block)
    pad = NB * block - N
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return a, NB, pad


def _prep(table, x, block):
    L, T, F = table.shape
    if 128 % F:
        raise ValueError(f"n_features={F} must divide 128 for the fused path")
    RE = 128 // F
    tbl_blocks = table.reshape(L, T // RE, 128)
    x, NB, pad = _pad_rows(x, block)
    return tbl_blocks, x, L, T, F, RE, NB, pad


def _specs(B, BT, L):
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    x_spec = pl.BlockSpec((B, 3), lambda l, b: (b, 0), memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((1, BT, 128), lambda l, b: (l, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = lambda F: pl.BlockSpec((1, B, F), lambda l, b: (l, b, 0),
                                    memory_space=pltpu.VMEM)
    return smem, x_spec, tbl_spec, g_spec


@partial(jax.jit, static_argnames=("table_size", "block", "compute_dtype",
                                   "interpret"))
def _encode_fwd(table, x, res_arr, dense_arr, *, table_size, block,
                compute_dtype, interpret):
    tbl_blocks, xp, L, T, F, RE, NB, pad = _prep(table, x, block)
    BT = T // RE
    smem, x_spec, tbl_spec, g_spec = _specs(block, BT, L)
    out = pl.pallas_call(
        partial(_fwd_kernel, T=T, F=F, BT=BT,
                compute_dtype=jnp.dtype(compute_dtype)),
        grid=(L, NB),
        in_specs=[smem, smem, x_spec, tbl_spec],
        out_specs=g_spec(F),
        out_shape=jax.ShapeDtypeStruct((L, NB * block, F), jnp.float32),
        interpret=interpret,
    )(res_arr, dense_arr, xp, tbl_blocks)
    N = x.shape[0]
    return jnp.moveaxis(out[:, :N], 0, 1).reshape(N, L * F)


@partial(jax.jit, static_argnames=("L", "F", "table_size", "block",
                                   "compute_dtype", "interpret"))
def _encode_bwd_table(x, g, res_arr, dense_arr, *, L, F, table_size, block,
                      compute_dtype, interpret):
    T = table_size
    RE = 128 // F
    BT = T // RE
    x, NB, _ = _pad_rows(x, block)
    g, _, _ = _pad_rows(g, block)  # zero cotangents on padded rows: no grads
    gL = jnp.moveaxis(g.reshape(NB * block, L, F), 1, 0)
    smem, x_spec, tbl_spec, g_spec = _specs(block, BT, L)
    out = pl.pallas_call(
        partial(_bwd_table_kernel, T=T, F=F, BT=BT,
                compute_dtype=jnp.dtype(compute_dtype)),
        grid=(L, NB),
        in_specs=[smem, smem, x_spec, g_spec(F)],
        out_specs=tbl_spec,
        out_shape=jax.ShapeDtypeStruct((L, BT, 128), jnp.float32),
        interpret=interpret,
    )(res_arr, dense_arr, x, gL)
    return out.reshape(L, T, F)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def hashgrid_encode_fused(table, x, res_arr, dense_arr, table_size,
                          block=512, compute_dtype="float32",
                          interpret=False):
    """Fused-MXU hash-grid encode: x [N, 3] in [0,1] -> [N, L*F].

    Drop-in for `models.nerf_hashgrid.hashgrid_encode` (same table layout,
    hashing, and trilinear rule) for tables with log2_table_size <=
    MAX_FUSED_LOG2. `compute_dtype` sets the one-hot matmul operand dtype:
    float32 reproduces the XLA path to ~1e-4 (MXU accumulation order);
    bfloat16 rounds the table reads like tcnn's fp16 tables.
    """
    return _encode_fwd(table, x, res_arr, dense_arr, table_size=table_size,
                       block=block, compute_dtype=compute_dtype,
                       interpret=interpret)


def _fused_fwd(table, x, res_arr, dense_arr, table_size, block, compute_dtype,
               interpret):
    out = _encode_fwd(table, x, res_arr, dense_arr, table_size=table_size,
                      block=block, compute_dtype=compute_dtype,
                      interpret=interpret)
    return out, (table, x, res_arr, dense_arr)


def _fused_bwd(table_size, block, compute_dtype, interpret, res, g):
    table, x, res_arr, dense_arr = res
    L, T, F = table.shape
    d_table = _encode_bwd_table(x, g, res_arr, dense_arr, L=L, F=F,
                                table_size=table_size, block=block,
                                compute_dtype=compute_dtype,
                                interpret=interpret)
    # Position gradient through the XLA encode's VJP: a gather-only program
    # (no scatter — the TPU-hostile op is only in the TABLE gradient). In the
    # training step positions carry no parameter dependence, so XLA
    # dead-code-eliminates this entire branch; it only runs when a caller
    # actually differentiates w.r.t. positions.
    from mvip_tpu.models.nerf_hashgrid import hashgrid_encode

    _, vjp_x = jax.vjp(
        lambda xx: hashgrid_encode(
            table, xx, res_arr, table_size, dense_arr.astype(jnp.bool_)
        ),
        x,
    )
    d_x = vjp_x(g)[0]
    return d_table.astype(table.dtype), d_x.astype(x.dtype), None, None


hashgrid_encode_fused.defvjp(_fused_fwd, _fused_bwd)
