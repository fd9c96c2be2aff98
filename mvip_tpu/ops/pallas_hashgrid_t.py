"""Transposed (points-on-lanes) Pallas hash-grid encoder.

Second-generation TPU redesign of the tcnn HashGrid kernel pair
(`DS_NeRF/run_nerf_helpers_tcnn.py:36-47`). The first fused kernel
(`ops/pallas_hashgrid.py`) spends ~2/3 of its wall-clock in [B, 8]-shaped
index math (6% lane utilization) and per-row `dynamic_gather` lane selects
(measured stage ablation in ROADMAP.md). This layout transposes the whole
problem so every stage runs wide:

  * positions arrive TRANSPOSED: three [1, B] lane rows (x, y, z) per block —
    per-corner index math is [1, B] full-lane VPU work, with the 8 corner
    offsets as static Python constants (no [B, 8] narrow arrays at all);
  * the one-hot is generated TRANSPOSED, [BT, B] (block-row iota on sublanes
    vs hi broadcast on lanes), feeding the gather matmul
    tblT [128, BT] @ onehotT [BT, B] -> rows [128, B] — identical MXU flops
    to the first kernel, zero layout changes anywhere;
  * the table is pre-arranged FEATURE-MAJOR (lane j = f*RE + e), so selecting
    feature f of entry `lo` is a static contiguous sublane slice
    rows[f*RE:(f+1)*RE] followed by a masked sublane-sum — no dynamic_gather;
  * outputs stay transposed, [L*F, N] (features on sublanes, points on
    lanes) — exactly the layout a transposed tiny-MLP consumer wants; the
    standalone wrapper transposes back to [N, L*F] in XLA (one cheap
    relayout at the boundary instead of thousands inside the kernel).

The backward table kernel is the same trick run in reverse: the weighted
cotangent is spread onto feature-major sublanes ([128, B]) and
scatter-accumulated by the transposed one-hot matmul
grow [128, B] @ onehotT^T -> [128, BT] into a VMEM-resident accumulator.

Hashing/trilinear semantics are bit-identical to `hashgrid_encode` /
`hashgrid_encode_fused` (shared corner rule incl. the res-1 floor clamp);
oracle tests compare all three.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvip_tpu.ops.pallas_hashgrid import _PRIMES_I32

MAX_FUSED_LOG2_T = 19  # tcnn's default table size; see _cap_block for cost


def _compiler_params(BT: int, slab_elems: int = 0):
    """Raise Mosaic's scoped-VMEM cap (default 16MB) for tcnn-capacity tables
    and for corner-merged one-hot slabs.

    At 2^19 (BT=8192) the backward kernel's [128, BT] accumulator + output
    block + double-buffered [BT, B] one-hot slabs need ~28MB of kernel stack
    (measured: `Scoped allocation with size 27.59M ... limit 16.00M` on v5e);
    the cap is permission, not usage, so the fast 2^15 default is unaffected.
    `slab_elems` = BT * merge * B of the widest in-kernel one-hot; above ~2M
    f32 elements (8MB) the default cap needs the same raise."""
    if BT <= 2048 and slab_elems <= (1 << 21):
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _auto_merge(BT: int, B: int) -> int:
    """Corners per gather matmul (default 1 = unmerged).

    Merging concatenates corner one-hots along lanes so one
    [128, BT] @ [BT, MC*B] pass replaces MC per-corner matmuls — identical
    MACs, fewer matmul dispatches, and (in the backward) MXU-internal
    accumulation instead of MC-1 VPU adds of the [128, BT] accumulator.
    MEASURED REFUTED as a perf lever (v5e, canonical 131k-pt load, T=2^15):
    merge in {1,2,4,8} x block in {256,512,1024} all land at 14.1-15.9 ms fwd
    and 14.3-15.9 ms table-grad — the kernel runs at ~78% of the MXU gather
    roofline (8*L*F*T*B MACs = 11.2 ms at peak) at merge=1 already, so there
    are no dispatch bubbles left to merge away. Same conclusion as the bf16
    table-operand ablation (BASELINE.md r2): the encode is MAC-bound; only
    fewer points (occupancy pruning) or a smaller T reduce its time. The
    `merge` knob stays for future Mosaic regressions."""
    return 1


def _cap_block(block: int, BT: int) -> int:
    """Cap the point block so the [BT, B] one-hot slab stays <= ~4MB VMEM
    (alongside the [128, BT] table block and [128, B] rows). The one-hot
    matmul cost is linear in T either way — 2^15 is the fast default
    (15ms fwd / 131k pts on one v5e); 2^19 runs at tcnn's full capacity for
    quality-parity runs (~16x the MXU+onehot work)."""
    cap = max(128, (1 << 20) // BT)
    return min(block, cap)


def _level_groups(res_static, T: int, RE: int):
    """Partition levels into contiguous groups of equal trimmed slab width.

    A dense level only ever addresses its first (res+1)^3 table entries, so
    its one-hot gather matmul can run against a lane-trimmed slab
    tblT[:, :BT_l] instead of the full [128, T/RE] — the gather/scatter MAC
    cost is linear in the slab width. tcnn gets the same effect for free from
    random-access gathers (`DS_NeRF/run_nerf_helpers_tcnn.py:36-47`); on the
    MXU it has to be static shape trimming. Levels are grouped contiguously
    by equal padded width (resolutions ascend, so dense levels prefix the
    list) and each group becomes one pallas_call.

    Returns a list of (start, stop, BT_group) or None when trimming cannot
    help (no static resolutions, small table, or every level already full).
    Measured on one v5e (tools/bench_encode.py, 131k pts): at 2^19 trimming
    is 1.25x on BOTH kernels (fwd 184.9 -> 148.5 ms, bwd-dominated grad
    197 -> 158.9 ms); at 2^15 the fwd gain is noise-level but the grouped
    BACKWARD regresses 3x (45 ms vs 15) — so trimming only engages for
    tcnn-capacity tables (BT_full >= 2048, i.e. T >= 2^17 at F=2).
    """
    BT_full = T // RE
    if res_static is None or BT_full < 2048:
        return None
    bts = []
    for r in res_static:
        n = (int(r) + 1) ** 3
        if n <= T:  # dense level: indices stay inside the first n entries
            rows = -(-n // RE)
            bts.append(min(BT_full, -(-rows // 128) * 128))
        else:
            bts.append(BT_full)
    if all(bt == BT_full for bt in bts):
        return None
    groups = []
    for i, bt in enumerate(bts):
        if groups and groups[-1][2] == bt:
            groups[-1] = (groups[-1][0], i + 1, bt)
        else:
            groups.append((i, i + 1, bt))
    return groups


def _corner_math_t(xs, ys, zs, res, c):
    """One corner's (hi-input) index + trilinear weight, all [1, B] lane rows.

    `c` is a static Python int 0..7; (ox, oy, oz) = bits of c. Same floor
    clamp / dense-vs-hash rule as `pallas_hashgrid._corner_geometry` /
    `_corner_indices`."""
    ox, oy, oz = (c >> 2) & 1, (c >> 1) & 1, c & 1
    rf = res.astype(jnp.float32)
    out_idx = []
    w = None
    for (v, o) in ((xs, ox), (ys, oy), (zs, oz)):
        pos = v * rf
        ip = jnp.minimum(jnp.floor(pos).astype(jnp.int32), res - 1)
        frac = pos - ip.astype(jnp.float32)
        out_idx.append(ip + o)
        wd = frac if o else 1.0 - frac
        w = wd if w is None else w * wd
    return out_idx, w


def _corner_index_t(cxyz, res, use_dense, T):
    cx, cy, cz = cxyz
    res1 = res + 1
    dense_idx = (cx * res1 + cy) * res1 + cz
    h = cx * _PRIMES_I32[0] ^ cy * _PRIMES_I32[1] ^ cz * _PRIMES_I32[2]
    return jnp.where(use_dense > 0, dense_idx & (T - 1), h & (T - 1))


def _fwd_kernel_t(res_ref, dense_ref, x_ref, tbl_ref, out_ref, *, T, F, RE, BT,
                  compute_dtype, merge):
    lvl = pl.program_id(0)
    res = res_ref[lvl]
    use_dense = dense_ref[lvl]
    x = x_ref[:]                      # [3, B]
    xs, ys, zs = x[0:1], x[1:2], x[2:3]
    B = x.shape[1]
    tblT = tbl_ref[0]                 # [128, BT] feature-major lane rows

    sub_bt = jax.lax.broadcasted_iota(jnp.int32, (BT, B), 0)
    sub_re = jax.lax.broadcasted_iota(jnp.int32, (RE, B), 0)
    shift = RE.bit_length() - 1       # RE = 128/F is a power of two

    acc = [jnp.zeros((1, B), jnp.float32) for _ in range(F)]
    for c0 in range(0, 8, merge):
        group = range(c0, min(c0 + merge, 8))
        hots, ws, los = [], [], []
        for c in group:
            cxyz, w = _corner_math_t(xs, ys, zs, res, c)
            idx = _corner_index_t(cxyz, res, use_dense, T)  # [1, B]
            hots.append((sub_bt == (idx >> shift)).astype(compute_dtype))
            los.append(idx & (RE - 1))
            ws.append(w)
        # lanes-concat the per-corner one-hots: one [128, BT] @ [BT, MC*B]
        # matmul gathers every corner in the group (the [BT, B] operands are
        # full vregs, so the concat is a pure lane-tiling op — concatenating
        # the narrow [1, B] hi rows instead would be a banned narrow concat)
        onehotT = hots[0] if len(hots) == 1 else jnp.concatenate(hots, 1)
        rows = jax.lax.dot_general(
            tblT.astype(compute_dtype), onehotT,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [128, MC*B]
        for j in range(len(hots)):
            r = rows if len(hots) == 1 else rows[:, j * B:(j + 1) * B]
            sel = (sub_re == los[j]).astype(jnp.float32)     # [RE, B]
            for f in range(F):
                feat = jnp.sum(r[f * RE:(f + 1) * RE] * sel, 0, keepdims=True)
                acc[f] = acc[f] + ws[j] * feat

    for f in range(F):
        out_ref[0, f:f + 1] = acc[f]


def _bwd_table_kernel_t(res_ref, dense_ref, x_ref, g_ref, out_ref, *, T, F, RE,
                        BT, compute_dtype, merge):
    lvl = pl.program_id(0)
    blk = pl.program_id(1)
    res = res_ref[lvl]
    use_dense = dense_ref[lvl]
    x = x_ref[:]
    xs, ys, zs = x[0:1], x[1:2], x[2:3]
    B = x.shape[1]
    g = g_ref[0]                       # [F, B] cotangents (transposed)

    sub_bt = jax.lax.broadcasted_iota(jnp.int32, (BT, B), 0)
    sub128 = jax.lax.broadcasted_iota(jnp.int32, (128, B), 0)
    shift = RE.bit_length() - 1

    acc = jnp.zeros((128, BT), jnp.float32)
    for c0 in range(0, 8, merge):
        group = range(c0, min(c0 + merge, 8))
        grows, hots = [], []
        for c in group:
            cxyz, w = _corner_math_t(xs, ys, zs, res, c)
            idx = _corner_index_t(cxyz, res, use_dense, T)
            hi, lo = idx >> shift, idx & (RE - 1)
            # weighted cotangent spread onto feature-major sublanes: [128, B]
            grow = jnp.zeros((128, B), jnp.float32)
            for f in range(F):
                grow = grow + jnp.where(
                    sub128 == f * RE + lo, w * g[f:f + 1], 0.0
                )
            grows.append(grow)
            hots.append((sub_bt == hi).astype(compute_dtype))
        # lanes-concat the group: contracting over MC*B lanes scatter-adds
        # every corner in ONE matmul — the cross-corner sum happens inside
        # the MXU accumulator instead of MC-1 VPU adds of [128, BT]
        growM = grows[0] if len(grows) == 1 else jnp.concatenate(grows, 1)
        onehotT = hots[0] if len(hots) == 1 else jnp.concatenate(hots, 1)
        acc = acc + jax.lax.dot_general(
            growM.astype(compute_dtype), onehotT,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # [128, BT]

    @pl.when(blk == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] = out_ref[0] + acc


def _pad_cols(a, block):
    n = a.shape[-1]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1
        )
    return a, nb, pad


def table_to_lanes(table):
    """[L, T, F] -> feature-major transposed lane blocks [L, 128, BT].

    Lane row j = f*RE + e holds feature f of the e-th entry in each block row
    (RE = 128//F entries per block row, BT = T//RE block rows)."""
    L, T, F = table.shape
    RE = 128 // F
    t = table.reshape(L, T // RE, RE, F)          # [L, BT, RE, F]
    return jnp.transpose(t, (0, 3, 2, 1)).reshape(L, 128, T // RE)


def lanes_to_table(tblT, T, F):
    """Inverse of `table_to_lanes` (used for the table-gradient layout)."""
    L = tblT.shape[0]
    RE = 128 // F
    t = tblT.reshape(L, F, RE, T // RE)
    return jnp.transpose(t, (0, 3, 2, 1)).reshape(L, T, F)


def _specs_t(B, BT, L, F):
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    x_spec = pl.BlockSpec((3, B), lambda l, b: (0, b), memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((1, 128, BT), lambda l, b: (l, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, F, B), lambda l, b: (l, 0, b),
                          memory_space=pltpu.VMEM)
    return smem, x_spec, tbl_spec, g_spec


@partial(jax.jit, static_argnames=("table_size", "block", "compute_dtype",
                                   "interpret", "res_static", "merge"))
def _encode_fwd_t(table, x, res_arr, dense_arr, *, table_size, block,
                  compute_dtype, interpret, res_static=None, merge=None):
    L, T, F = table.shape
    if 128 % F:
        raise ValueError(f"n_features={F} must divide 128 for the fused path")
    RE = 128 // F
    BT = T // RE
    block = _cap_block(block, BT)
    tblT = table_to_lanes(table)
    # A compute_dtype cast INSIDE the kernel is elided by Mosaic (measured:
    # bf16 and f32 compute_dtype train bit-identically, BASELINE.md r2 notes).
    # Casting the table slab OUTSIDE hands the kernel a genuinely-bf16 input
    # block, so the gather matmul runs native-bf16 MXU passes with half the
    # table DMA — the tcnn analogue of its fp16 hash tables
    # (DS_NeRF/run_nerf_helpers_tcnn.py:36-47; tcnn stores __half entries).
    if jnp.dtype(compute_dtype) != jnp.float32:
        tblT = tblT.astype(compute_dtype)
    xT, NB, _ = _pad_cols(x.T, block)              # [3, NB*block]
    groups = _level_groups(res_static, T, RE) or [(0, L, BT)]
    outs = []
    for (s, e, BTg) in groups:
        Lg = e - s
        mc = merge if merge is not None else _auto_merge(BTg, block)
        smem, x_spec, tbl_spec, g_spec = _specs_t(block, BTg, Lg, F)
        outs.append(pl.pallas_call(
            partial(_fwd_kernel_t, T=T, F=F, RE=RE, BT=BTg,
                    compute_dtype=jnp.dtype(compute_dtype), merge=mc),
            grid=(Lg, NB),
            in_specs=[smem, smem, x_spec, tbl_spec],
            out_specs=g_spec,
            out_shape=jax.ShapeDtypeStruct((Lg, F, NB * block), jnp.float32),
            compiler_params=_compiler_params(BTg, BTg * mc * block),
            interpret=interpret,
        )(res_arr[s:e], dense_arr[s:e], xT, tblT[s:e, :, :BTg]))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
    N = x.shape[0]
    # [L, F, N] -> [N, L*F] (the one boundary relayout, done by XLA)
    return jnp.transpose(out[..., :N], (2, 0, 1)).reshape(N, L * F)


@partial(jax.jit, static_argnames=("L", "F", "table_size", "block",
                                   "compute_dtype", "interpret", "res_static",
                                   "merge"))
def _encode_bwd_table_t(x, g, res_arr, dense_arr, *, L, F, table_size, block,
                        compute_dtype, interpret, res_static=None, merge=None):
    T = table_size
    RE = 128 // F
    BT = T // RE
    block = _cap_block(block, BT)
    xT, NB, _ = _pad_cols(x.T, block)
    # g [N, L*F] -> [L, F, N] (padded cols get zero cotangent: no grads)
    gT = jnp.transpose(g.reshape(g.shape[0], L, F), (1, 2, 0))
    gT, _, _ = _pad_cols(gT, block)
    groups = _level_groups(res_static, T, RE) or [(0, L, BT)]
    outs = []
    for (s, e, BTg) in groups:
        Lg = e - s
        mc = merge if merge is not None else _auto_merge(BTg, block)
        smem, x_spec, tbl_spec, g_spec = _specs_t(block, BTg, Lg, F)
        out_g = pl.pallas_call(
            partial(_bwd_table_kernel_t, T=T, F=F, RE=RE, BT=BTg,
                    compute_dtype=jnp.dtype(compute_dtype), merge=mc),
            grid=(Lg, NB),
            in_specs=[smem, smem, x_spec, g_spec],
            out_specs=tbl_spec,
            out_shape=jax.ShapeDtypeStruct((Lg, 128, BTg), jnp.float32),
            compiler_params=_compiler_params(BTg, BTg * mc * block),
            interpret=interpret,
        )(res_arr[s:e], dense_arr[s:e], xT, gT[s:e])
        if BTg < BT:  # entries beyond a dense level's range get zero grad
            out_g = jnp.pad(out_g, ((0, 0), (0, 0), (0, BT - BTg)))
        outs.append(out_g)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
    return lanes_to_table(out, T, F)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def hashgrid_encode_fused_t(table, x, res_arr, dense_arr, table_size,
                            block=1024, compute_dtype="float32",
                            interpret=False, res_static=None, merge=None):
    """Transposed fused-MXU hash-grid encode: x [N, 3] in [0,1] -> [N, L*F].

    Drop-in for `hashgrid_encode_fused` (same hashing/trilinear semantics);
    see the module docstring for why this layout is faster. `res_static`
    (hashable tuple mirroring res_arr) enables dense-level slab trimming —
    see `_level_groups`. `merge` (1/2/4/8, None = auto) sets how many corners
    share one gather matmul — see `_auto_merge`."""
    return _encode_fwd_t(table, x, res_arr, dense_arr, table_size=table_size,
                         block=block, compute_dtype=compute_dtype,
                         interpret=interpret, res_static=res_static,
                         merge=merge)


def _fused_t_fwd(table, x, res_arr, dense_arr, table_size, block,
                 compute_dtype, interpret, res_static, merge):
    out = _encode_fwd_t(table, x, res_arr, dense_arr, table_size=table_size,
                        block=block, compute_dtype=compute_dtype,
                        interpret=interpret, res_static=res_static,
                        merge=merge)
    return out, (table, x, res_arr, dense_arr)


def _fused_t_bwd(table_size, block, compute_dtype, interpret, res_static,
                 merge, res, g):
    table, x, res_arr, dense_arr = res
    L, T, F = table.shape
    d_table = _encode_bwd_table_t(x, g, res_arr, dense_arr, L=L, F=F,
                                  table_size=table_size, block=block,
                                  compute_dtype=compute_dtype,
                                  interpret=interpret, res_static=res_static,
                                  merge=merge)
    # position gradient via the XLA encode's VJP (gather-only; DCE'd in the
    # train step where positions carry no parameter dependence) — same
    # argument as pallas_hashgrid._fused_bwd
    from mvip_tpu.models.nerf_hashgrid import hashgrid_encode

    _, vjp_x = jax.vjp(
        lambda xx: hashgrid_encode(
            table, xx, res_arr, table_size, dense_arr.astype(jnp.bool_)
        ),
        x,
    )
    d_x = vjp_x(g)[0]
    return d_table.astype(table.dtype), d_x.astype(x.dtype), None, None


hashgrid_encode_fused_t.defvjp(_fused_t_fwd, _fused_t_bwd)
