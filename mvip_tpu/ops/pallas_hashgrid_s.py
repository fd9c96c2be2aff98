"""Sorted-slab (gen-3) Pallas hash-grid encoder — breaking linear-in-T cost.

The gen-2 transposed encoder (`ops/pallas_hashgrid_t.py`) gathers table rows
with one-hot MXU matmuls whose contraction spans the WHOLE table: cost is
linear in T and measured at its MXU roofline (BASELINE.md r2) — 148/159 ms
fwd/grad at tcnn's T=2^19 capacity vs 14/15 ms at 2^15. tcnn itself
(`DS_NeRF/run_nerf_helpers_tcnn.py:36-47`) pays O(1) per query via CUDA
random access, which Pallas TPU does not have.

This module changes the ALGORITHM instead of the kernel: sort each level's
8N corner queries by table index, then every block of QBLK consecutive
sorted queries touches only a narrow contiguous table slab (~QBLK·T/8N
entries, 4x-16x headroom in a W-lane window), so the gather matmul contracts
over W=128 lanes instead of T/RE — at 2^19 that is 64x fewer effective MXU
passes, turning the encode cost T-independent. The new costs are three
batched `jax.lax.sort` calls per train step (measured by
`tools/bench_sort.py`):

  sort1 (fwd):  key=idx,  payloads (w, iota)       -> sorted queries + perm
  sort3 (fwd):  key=perm, payloads (F feats, iota) -> unsort + rank
  sort4 (bwd):  key=rank, payloads (F cotangents)  -> cotangents into sorted order

The permutation trick: sorting (perm, payload) by the unique keys `perm`
restores original order (perm[i] is where sorted element i came from), and
carrying an iota through that same sort yields `rank` = the inverse
permutation, which the backward uses to drag the (duplicated, gather-free)
per-query cotangents into the forward's sorted order.

Exactness: a pathological index distribution (conceivable only for mid-size
DENSE levels with spatially concentrated batches; hash levels are uniform by
construction) can overflow a block's slab window. The kernels count
out-of-window queries; if ANY block overflows, one `lax.cond` recomputes the
whole call with the gen-2 kernels — never a wrong result, just gen-2 speed
on (astronomically rare) adversarial batches.

Semantics are bit-identical to `hashgrid_encode` / `hashgrid_encode_fused_t`
(shared corner rule incl. the res-1 floor clamp; indices here are computed
in XLA *before* the sort, so the kernel itself is a pure sorted segmented
gather and needs no corner math at all).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvip_tpu.ops.pallas_hashgrid import _PRIMES_I32
from mvip_tpu.ops.pallas_hashgrid_t import (
    _encode_bwd_table_t,
    _encode_fwd_t,
    lanes_to_table,
    table_to_lanes,
)

W_LANES = 256          # slab window width in lanes (x64 entries/lane = 16384 entries);
                       # a multiple of 128: the HBM table is (8,128)-tiled, so the
                       # slab DMA's lane offset must be 128-aligned — the base is
                       # computed in TILE space (clamped there, x128 last) so Mosaic
                       # can prove divisibility, and the 2-tile window preserves the
                       # ">=128 lanes beyond the block's first query" coverage
QBLK = 2048            # sorted queries per kernel block
MIN_SORTED_LOG2_T = 17  # below this even the kernel PAIR loses to gen-2


def sorted_encode_active(hcfg) -> bool:
    """Static dispatch: does this HashGridConfig ride the sorted-slab path?

    "auto" now always picks gen-2 (r4 measurement): the sorted-slab kernels
    win the isolated fwd+bwd pair 2.0x at 2^19 (186.7 vs 378.5 ms), but the
    END-TO-END 2^19 train step measures gen2 1163 rays/s vs sorted 625
    (bench.py `hashgrid_219_*` rows) — the three `lax.sort` calls per
    encode (~250 ms/step standalone, tools/bench_sort.py) do NOT overlap
    away inside the full differentiated step. The sorted path stays
    available via `encode_mode=sorted` (bit-exact vs gen-2) for workloads
    where the encode share is larger (e.g. pure-encode inference)."""
    mode = getattr(hcfg, "encode_mode", "auto")
    return mode == "sorted"


def _corner_queries(x, res_arr, dense_arr, T):
    """x [N, 3] in [0,1] -> (idx [L, 8N] i32, w [L, 8N] f32), point-major
    (query q = p*8 + c). Same math as models/nerf_hashgrid.hashgrid_encode."""
    offsets = jnp.stack(
        jnp.meshgrid(*([jnp.arange(2)] * 3), indexing="ij"), -1
    ).reshape(8, 3)

    def level(res, dense_ok):
        pos = x * res
        ipos = jnp.minimum(jnp.floor(pos).astype(jnp.int32), res - 1)
        frac = pos - ipos
        corners = ipos[:, None, :] + offsets[None]                  # [N, 8, 3]
        res1 = res + 1
        dense = (corners[..., 0] * res1 + corners[..., 1]) * res1 + corners[..., 2]
        h = (corners[..., 0] * _PRIMES_I32[0] ^ corners[..., 1] * _PRIMES_I32[1]
             ^ corners[..., 2] * _PRIMES_I32[2])
        # int32 & (T-1) == remainder(., T) for power-of-two T (two's complement)
        idx = jnp.where(dense_ok, dense & (T - 1), h & (T - 1))     # [N, 8]
        w = jnp.where(offsets[None].astype(bool), frac[:, None, :],
                      1.0 - frac[:, None, :])
        w = jnp.prod(w, -1)                                          # [N, 8]
        return idx.reshape(-1), w.reshape(-1)

    idx, w = jax.vmap(level)(res_arr, dense_arr)
    return idx, w


def _fwd_kernel_s(sidx_ref, sw_ref, tbl_ref, out_ref, ovf_ref, slab_ref,
                  sem_ref, *, F, RE, BT, W):
    l = pl.program_id(0)
    shift = RE.bit_length() - 1                        # entries per lane = RE
    idx = sidx_ref[0, 0]                               # [1, QBLK] i32
    # tile-space clamp, x128 last: provably 128-aligned lane offset
    base_tile = jnp.clip((idx[0, 0] >> shift) // 128, 0, BT // 128 - W // 128)
    base_lane = base_tile * 128                        # scalar
    dma = pltpu.make_async_copy(
        tbl_ref.at[l, :, pl.ds(base_lane, W)], slab_ref, sem_ref)
    dma.start()

    rel_lane = (idx >> shift) - base_lane              # [1, QBLK]
    sub = idx & (RE - 1)
    inwin = (rel_lane >= 0) & (rel_lane < W)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (W, idx.shape[1]), 0)
    hot = jnp.where(inwin, (lane_iota == rel_lane).astype(jnp.float32), 0.0)

    dma.wait()
    rows = jax.lax.dot_general(
        slab_ref[:], hot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [128, QBLK]

    sub_re = jax.lax.broadcasted_iota(jnp.int32, (RE, idx.shape[1]), 0)
    sel = (sub_re == sub).astype(jnp.float32)          # [RE, QBLK]
    w = sw_ref[0, 0]                                   # [1, QBLK]
    for f in range(F):
        feat = jnp.sum(rows[f * RE:(f + 1) * RE] * sel, 0, keepdims=True)
        out_ref[0, f:f + 1] = w * feat

    # padded queries carry w=0 AND idx=0 (they sort to block 0, in-window);
    # real out-of-window queries are the fallback trigger
    ovf_ref[0, 0, 0, 0] = jnp.sum(jnp.where(inwin, 0, 1).astype(jnp.int32))


def _bwd_kernel_s(sidx_ref, sw_ref, sg_ref, tbl_g_ref, slab0_ref, *, F, RE,
                  BT, W):
    del slab0_ref  # scratch kept for spec symmetry (unused)
    b = pl.program_id(1)
    shift = RE.bit_length() - 1                        # entries per lane = RE
    idx = sidx_ref[0, 0]                               # [1, QBLK]
    base_tile = jnp.clip((idx[0, 0] >> shift) // 128, 0, BT // 128 - W // 128)
    base_lane = base_tile * 128

    rel_lane = (idx >> shift) - base_lane
    sub = idx & (RE - 1)
    inwin = (rel_lane >= 0) & (rel_lane < W)
    Q = idx.shape[1]
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (W, Q), 0)
    hot = jnp.where(inwin, (lane_iota == rel_lane).astype(jnp.float32), 0.0)

    sub128 = jax.lax.broadcasted_iota(jnp.int32, (128, Q), 0)
    w = sw_ref[0, 0]                                   # [1, Q]
    g = sg_ref[0]                                      # [F, Q]
    grow = jnp.zeros((128, Q), jnp.float32)
    for f in range(F):
        grow = grow + jnp.where(sub128 == f * RE + sub, w * g[f:f + 1], 0.0)

    mm = jax.lax.dot_general(
        grow, hot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [128, W]

    @pl.when(b == 0)
    def _():
        tbl_g_ref[0] = jnp.zeros_like(tbl_g_ref[0])

    tbl_g_ref[0, :, pl.ds(base_lane, W)] = (
        tbl_g_ref[0, :, pl.ds(base_lane, W)] + mm)


def _pad_queries(idx, w, qblk):
    L, Q = idx.shape
    nb = -(-Q // qblk)
    pad = nb * qblk - Q
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, pad)))
    return idx, w, nb, pad


@partial(jax.jit, static_argnames=("table_size", "interpret"))
def _sorted_fwd(table, x, res_arr, dense_arr, *, table_size, interpret):
    """Returns (out [N, L*F], residuals for bwd)."""
    L, T, F = table.shape
    RE = 128 // F
    BT = T // RE
    N = x.shape[0]
    idx, w = _corner_queries(x, res_arr, dense_arr, T)       # [L, 8N]
    idx, w, NB, _pad = _pad_queries(idx, w, QBLK)
    QP = idx.shape[1]
    iota = jnp.broadcast_to(jnp.arange(QP, dtype=jnp.int32)[None], (L, QP))

    sidx, sw, perm = jax.lax.sort((idx, w, iota), dimension=1, num_keys=1)

    tblT = table_to_lanes(table)                              # [L, 128, BT]
    W = min(W_LANES, BT)
    # queries ride as [L, NB, 1, QBLK] so the block's LAST TWO dims
    # (1, QBLK) equal the array's — Mosaic's block-shape rule rejects a
    # (1, QBLK) block over a 2-D (L, QP) array (second-to-last dim 1 is
    # neither 8-divisible nor == L)
    sidx4 = sidx.reshape(L, NB, 1, QBLK)
    sw4 = sw.reshape(L, NB, 1, QBLK)
    q_spec = pl.BlockSpec((1, 1, 1, QBLK), lambda l, b: (l, b, 0, 0),
                          memory_space=pltpu.VMEM)
    featw, ovf = pl.pallas_call(
        partial(_fwd_kernel_s, F=F, RE=RE, BT=BT, W=W),
        grid=(L, NB),
        in_specs=[q_spec, q_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec((1, F, QBLK), lambda l, b: (l, 0, b),
                                memory_space=pltpu.VMEM),
                   # (1,1,1,1) SMEM block: the sanctioned home for a 0-d
                   # scalar reduction (Mosaic rejects 0-d stores into VMEM
                   # blocks; the last-two-dims block rule also rejects a
                   # (1,1) block over a 2-D (L, NB) array — hence 4-D)
                   pl.BlockSpec((1, 1, 1, 1), lambda l, b: (l, b, 0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((L, F, QP), jnp.float32),
                   jax.ShapeDtypeStruct((L, NB, 1, 1), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((128, W), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(sidx4, sw4, tblT)

    # unsort (keys `perm` are a permutation -> restores original query order)
    # and produce rank = inverse permutation for the backward
    ops = (perm,) + tuple(featw[:, f] for f in range(F)) + (iota,)
    sorted_back = jax.lax.sort(ops, dimension=1, num_keys=1)
    feats = jnp.stack(sorted_back[1:1 + F], axis=-1)          # [L, QP, F]
    rank = sorted_back[-1]

    out = feats[:, :8 * N].reshape(L, N, 8, F).sum(2)         # [L, N, F]
    out = jnp.moveaxis(out, 0, 1).reshape(N, L * F)

    any_ovf = jnp.sum(ovf) > 0
    # exact fallback: recompute with the gen-2 full-table kernels (same
    # program the classic path uses -> warm in the compile cache)
    out = jax.lax.cond(
        any_ovf,
        lambda: _encode_fwd_t(table, x, res_arr, dense_arr,
                              table_size=table_size, block=1024,
                              compute_dtype="float32", interpret=interpret),
        lambda: out,
    )
    return out, (sidx, sw, rank, any_ovf)


@partial(jax.jit, static_argnames=("L", "F", "table_size", "interpret"))
def _sorted_bwd_table(x, g, sidx, sw, rank, any_ovf, res_arr, dense_arr, *,
                      L, F, table_size, interpret):
    T = table_size
    RE = 128 // F
    BT = T // RE
    N = x.shape[0]
    QP = sidx.shape[1]
    # per-query cotangent in original order, gather-free: tile each point's
    # g over its 8 corners (point-major query layout)
    gT = jnp.transpose(g.reshape(N, L, F), (1, 0, 2))         # [L, N, F]
    gdup = jnp.broadcast_to(gT[:, :, None, :], (L, N, 8, F)).reshape(L, 8 * N, F)
    if QP > 8 * N:
        gdup = jnp.pad(gdup, ((0, 0), (0, QP - 8 * N), (0, 0)))

    ops = (rank,) + tuple(gdup[..., f] for f in range(F))
    sorted_g = jax.lax.sort(ops, dimension=1, num_keys=1)
    sg = jnp.stack(sorted_g[1:1 + F], axis=1)                  # [L, F, QP]

    NB = QP // QBLK
    W = min(W_LANES, BT)
    sidx4 = sidx.reshape(L, NB, 1, QBLK)
    sw4 = sw.reshape(L, NB, 1, QBLK)
    q_spec = pl.BlockSpec((1, 1, 1, QBLK), lambda l, b: (l, b, 0, 0),
                          memory_space=pltpu.VMEM)
    tbl_g = pl.pallas_call(
        partial(_bwd_kernel_s, F=F, RE=RE, BT=BT, W=W),
        grid=(L, NB),
        in_specs=[q_spec, q_spec,
                  pl.BlockSpec((1, F, QBLK), lambda l, b: (l, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128, BT), lambda l, b: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, 128, BT), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if BT > 2048 else None,
        interpret=interpret,
    )(sidx4, sw4, sg)
    d_table = lanes_to_table(tbl_g, T, F)

    d_table = jax.lax.cond(
        any_ovf,
        lambda: _encode_bwd_table_t(x, g, res_arr, dense_arr, L=L, F=F,
                                    table_size=table_size, block=1024,
                                    compute_dtype="float32",
                                    interpret=interpret),
        lambda: d_table,
    )
    return d_table


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def hashgrid_encode_sorted(table, x, res_arr, dense_arr, table_size,
                           interpret=False):
    """Sorted-slab fused encode: x [N, 3] in [0,1] -> [N, L*F].

    Drop-in for `hashgrid_encode_fused_t` at large T (>= 2^MIN_SORTED_LOG2_T);
    same hashing/trilinear semantics, T-independent gather cost. See module
    docstring for the design and the exact-fallback guarantee."""
    out, _ = _sorted_fwd(table, x, res_arr, dense_arr, table_size=table_size,
                         interpret=interpret)
    return out


def _sorted_vjp_fwd(table, x, res_arr, dense_arr, table_size, interpret):
    out, res = _sorted_fwd(table, x, res_arr, dense_arr,
                           table_size=table_size, interpret=interpret)
    return out, (table, x, res_arr, dense_arr) + res


def _sorted_vjp_bwd(table_size, interpret, res, g):
    table, x, res_arr, dense_arr, sidx, sw, rank, any_ovf = res
    L, T, F = table.shape
    d_table = _sorted_bwd_table(x, g, sidx, sw, rank, any_ovf, res_arr,
                                dense_arr, L=L, F=F, table_size=table_size,
                                interpret=interpret)
    # position gradient via the XLA encode's VJP (DCE'd in the train step,
    # same argument as pallas_hashgrid_t._fused_t_bwd)
    from mvip_tpu.models.nerf_hashgrid import hashgrid_encode

    _, vjp_x = jax.vjp(
        lambda xx: hashgrid_encode(
            table, xx, res_arr, table_size, dense_arr.astype(jnp.bool_)
        ),
        x,
    )
    d_x = vjp_x(g)[0]
    return d_table.astype(table.dtype), d_x.astype(x.dtype), None, None


hashgrid_encode_sorted.defvjp(_sorted_vjp_fwd, _sorted_vjp_bwd)
