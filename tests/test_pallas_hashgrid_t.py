"""Transposed (points-on-lanes) fused encode vs the XLA oracle.

Same kernel-vs-oracle pattern as tests/test_pallas_hashgrid.py, for
`ops/pallas_hashgrid_t.py`: forward and table/position gradients must match
`models.nerf_hashgrid.hashgrid_encode` (interpret mode here; compiled-TPU
parity in bench runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.models.nerf_hashgrid import hashgrid_encode
from mvip_tpu.ops.pallas_hashgrid_t import (
    hashgrid_encode_fused_t,
    lanes_to_table,
    table_to_lanes,
)
from tests.test_pallas_hashgrid import _setup


def test_table_lane_layout_roundtrip():
    table, _, _, _, T = _setup()
    t2 = lanes_to_table(table_to_lanes(table), T, table.shape[2])
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(table))


@pytest.mark.parametrize("N", [256, 700])  # 700: exercises block padding
@pytest.mark.parametrize("F", [2, 4])
def test_transposed_forward_matches_xla(N, F):
    table, x, res_arr, dense, T = _setup(N=N, F=F)
    ref = hashgrid_encode(table, x, res_arr, T, dense)
    out = hashgrid_encode_fused_t(
        table, x, res_arr, dense.astype(jnp.int32), T, block=256,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_transposed_grads_match_xla():
    table, x, res_arr, dense, T = _setup(N=512)
    g = jax.random.normal(jax.random.PRNGKey(7), (512, table.shape[0] * 2))

    def loss_x(t, xx):
        return jnp.sum(hashgrid_encode(t, xx, res_arr, T, dense) * g)

    def loss_p(t, xx):
        return jnp.sum(
            hashgrid_encode_fused_t(
                t, xx, res_arr, dense.astype(jnp.int32), T, block=256,
                interpret=True,
            )
            * g
        )

    gt_x, gx_x = jax.grad(loss_x, (0, 1))(table, x)
    gt_p, gx_p = jax.grad(loss_p, (0, 1))(table, x)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_x), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_x), rtol=1e-4, atol=1e-2
    )


def test_transposed_matches_first_gen():
    """Both fused kernels implement the same semantics bit-for-bit-ish."""
    from mvip_tpu.ops.pallas_hashgrid import hashgrid_encode_fused

    table, x, res_arr, dense, T = _setup(N=384)
    a = hashgrid_encode_fused(
        table, x, res_arr, dense.astype(jnp.int32), T, block=128,
        interpret=True,
    )
    b = hashgrid_encode_fused_t(
        table, x, res_arr, dense.astype(jnp.int32), T, block=256,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow  # tcnn-capacity (2^17) interpret-mode run, ~30 s alone
def test_trimmed_dense_levels_match_xla():
    """res_static enables dense-level slab trimming (`_level_groups`): dense
    levels gather against a lane-trimmed table slab. Forward + both grads must
    still match the XLA oracle, including clipped boundary points (x == 1.0,
    the ADVICE.md corner-coord clamp case)."""
    from mvip_tpu.ops.pallas_hashgrid_t import _level_groups

    # trimming only engages for tcnn-capacity tables (BT_full >= 2048 — see
    # _level_groups' measured gate), so test at 2^17
    table, x, res_arr, dense, T = _setup(L=4, log2T=17, N=500, finest=256.0)
    x = x.at[:3].set(jnp.asarray([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0],
                                  [1.0, 0.5, 0.0]]))
    res_static = tuple(int(r) for r in res_arr)
    groups = _level_groups(res_static, T, 64)
    assert groups is not None and len(groups) > 1  # trimming actually engaged
    assert any(bt < T // 64 for (_, _, bt) in groups)

    g = jax.random.normal(jax.random.PRNGKey(3), (500, table.shape[0] * 2))

    def loss_x(t, xx):
        return jnp.sum(hashgrid_encode(t, xx, res_arr, T, dense) * g)

    def loss_p(t, xx):
        return jnp.sum(
            hashgrid_encode_fused_t(
                t, xx, res_arr, dense.astype(jnp.int32), T, block=256,
                interpret=True, res_static=res_static,
            ) * g
        )

    ref = hashgrid_encode(table, x, res_arr, T, dense)
    out = hashgrid_encode_fused_t(
        table, x, res_arr, dense.astype(jnp.int32), T, block=256,
        interpret=True, res_static=res_static,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    gt_x, gx_x = jax.grad(loss_x, (0, 1))(table, x)
    gt_p, gx_p = jax.grad(loss_p, (0, 1))(table, x)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_x), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_x), rtol=1e-4, atol=1e-2
    )


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_bfloat16_table_operand_close_to_xla():
    """compute_dtype=bfloat16 casts the table slab OUTSIDE the kernel (a real
    bf16 MXU operand — in-kernel casts are elided by Mosaic; see BASELINE.md
    r2 notes). Semantics must match the f32 oracle within bf16 table-value
    rounding, mirroring tcnn's __half hash tables."""
    table, x, res_arr, dense, T = _setup(N=500, log2T=14, finest=64.0)
    ref = hashgrid_encode(table, x, res_arr, T, dense)
    out = hashgrid_encode_fused_t(
        table, x, res_arr, dense.astype(jnp.int32), T, block=256,
        compute_dtype="bfloat16", interpret=True,
        res_static=tuple(int(r) for r in res_arr),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_transposed_big_table_block_cap():
    """log2T > 16 shrinks the point block so the one-hot slab fits VMEM
    (tcnn-capacity 2^19 support); semantics stay oracle-exact."""
    table, x, res_arr, dense, T = _setup(L=3, log2T=17, N=300, finest=256.0)
    ref = hashgrid_encode(table, x, res_arr, T, dense)
    out = hashgrid_encode_fused_t(
        table, x, res_arr, dense.astype(jnp.int32), T, block=1024,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("mc", [2, 8])
@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_transposed_corner_merge_matches_xla(mc):
    """Corner-merged gather matmuls (`merge` > 1: per-corner one-hots
    lanes-concatenated into one [128, BT] @ [BT, MC*B] pass) are semantically
    identical to the unmerged default — fwd and table-grad vs the XLA oracle.
    Perf-refuted on v5e (see `_auto_merge`) but kept as an experiment knob."""
    table, x, res_arr, dense, T = _setup(N=300)
    ref = hashgrid_encode(table, x, res_arr, T, dense)
    out = hashgrid_encode_fused_t(
        table, x, res_arr, dense.astype(jnp.int32), T, block=256,
        interpret=True, merge=mc,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g = jax.random.normal(jax.random.PRNGKey(3), (300, table.shape[0] * 2))

    def loss_ref(t):
        return jnp.sum(hashgrid_encode(t, x, res_arr, T, dense) * g)

    def loss_mc(t):
        return jnp.sum(hashgrid_encode_fused_t(
            t, x, res_arr, dense.astype(jnp.int32), T, block=256,
            interpret=True, merge=mc) * g)

    gt_ref = jax.grad(loss_ref)(table)
    gt_mc = jax.grad(loss_mc)(table)
    np.testing.assert_allclose(np.asarray(gt_mc), np.asarray(gt_ref), atol=1e-4)
