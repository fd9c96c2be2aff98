"""Sorted-slab (gen-3) encode vs the XLA oracle.

Same kernel-vs-oracle pattern as tests/test_pallas_hashgrid{,_t}.py for
`ops/pallas_hashgrid_s.py`: forward and table/position gradients must match
`models.nerf_hashgrid.hashgrid_encode` bit-for-bit-ish (interpret mode here;
compiled-TPU parity + timing in tools/bench_encode.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.models.nerf_hashgrid import hashgrid_encode
from mvip_tpu.ops.pallas_hashgrid_s import (
    _corner_queries,
    hashgrid_encode_sorted,
)
from tests.test_pallas_hashgrid import _setup


def test_corner_queries_match_oracle_indices():
    """The XLA-side index/weight precompute must reproduce the oracle's
    corner rule exactly (incl. the res-1 floor clamp and dense-vs-hash)."""
    table, x, res_arr, dense, T = _setup(N=257)
    idx, w = _corner_queries(x, res_arr, dense, T)
    # oracle features with a one-hot table recover the indices' features;
    # instead compare against a direct recompute through the oracle's path:
    ref = hashgrid_encode(table, x, res_arr, T, dense)          # [N, L*F]
    L, _, F = table.shape
    gathered = jax.vmap(lambda t, i: jnp.take(t, i, 0))(
        table, idx.reshape(L, -1))                              # [L, 8N, F]
    feats = (gathered * w[..., None]).reshape(L, x.shape[0], 8, F).sum(2)
    mine = jnp.moveaxis(feats, 0, 1).reshape(x.shape[0], L * F)
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("N", [256, 700])  # 700: exercises query padding
@pytest.mark.parametrize("F", [2, 4])
def test_sorted_forward_matches_xla(N, F):
    table, x, res_arr, dense, T = _setup(N=N, F=F)
    ref = hashgrid_encode(table, x, res_arr, T, dense)
    out = hashgrid_encode_sorted(
        table, x, res_arr, dense.astype(jnp.int32), T, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sorted_forward_big_table():
    """T large enough that the slab window (W=128 lanes) is a strict subset
    of the table — the sorted path's actual operating regime."""
    table, x, res_arr, dense, T = _setup(L=4, log2T=14, N=512, finest=256.0)
    ref = hashgrid_encode(table, x, res_arr, T, dense)
    out = hashgrid_encode_sorted(
        table, x, res_arr, dense.astype(jnp.int32), T, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sorted_grads_match_xla():
    table, x, res_arr, dense, T = _setup(N=512, log2T=12, finest=128.0)
    g = jax.random.normal(jax.random.PRNGKey(7), (512, table.shape[0] * 2))

    def loss_x(t, xx):
        return jnp.sum(hashgrid_encode(t, xx, res_arr, T, dense) * g)

    def loss_s(t, xx):
        return jnp.sum(
            hashgrid_encode_sorted(
                t, xx, res_arr, dense.astype(jnp.int32), T, interpret=True)
            * g)

    gt_x, gx_x = jax.grad(loss_x, (0, 1))(table, x)
    gt_s, gx_s = jax.grad(loss_s, (0, 1))(table, x)
    np.testing.assert_allclose(np.asarray(gt_s), np.asarray(gt_x), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gx_s), np.asarray(gx_x), rtol=1e-4, atol=1e-2)


def test_sorted_matches_gen2():
    from mvip_tpu.ops.pallas_hashgrid_t import hashgrid_encode_fused_t

    table, x, res_arr, dense, T = _setup(N=384, log2T=12, finest=128.0)
    a = hashgrid_encode_fused_t(
        table, x, res_arr, dense.astype(jnp.int32), T, block=256,
        interpret=True)
    b = hashgrid_encode_sorted(
        table, x, res_arr, dense.astype(jnp.int32), T, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_hash_fused_chain_sorted_matches_gen2():
    """The full fused train chain (encode -> MLP/composite/loss/backward ->
    table grad) must produce identical losses/grads under encode_mode=sorted
    and gen2 (the wiring in ops/pallas_hash_train.hash_fused_render_grads)."""
    import dataclasses

    from mvip_tpu.ops.pallas_hash_train import hash_fused_render_grads
    from tests.test_pallas_hash_train import HCFG, _setup as _chain_setup

    args = _chain_setup()
    params = args[0]
    cfg_g2 = dataclasses.replace(HCFG, encode_mode="gen2")
    cfg_s = dataclasses.replace(HCFG, encode_mode="sorted")
    m2, g2 = hash_fused_render_grads(params, cfg_g2, *args[1:], block_rays=8,
                                     interpret=True)
    ms, gs = hash_fused_render_grads(params, cfg_s, *args[1:], block_rays=8,
                                     interpret=True)
    for k in ("sq_rgb", "sq_disp", "sq_depth"):
        np.testing.assert_allclose(float(ms[k]), float(m2[k]), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gs), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g2), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=str(pa))


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_hash_train_render_sorted_matches_gen2():
    """Differentiable fused guidance render (ops/pallas_hash_render) under
    both encode modes: outputs and parameter cotangents must agree."""
    import dataclasses

    from mvip_tpu.ops.pallas_hash_render import hash_train_render
    from tests.test_pallas_hash_train import HCFG, _setup as _chain_setup

    params, ro, rd, z, noise = _chain_setup()[:5]
    cfg_g2 = dataclasses.replace(HCFG, encode_mode="gen2")
    cfg_s = dataclasses.replace(HCFG, encode_mode="sorted")

    def loss(p, cfg):
        out = hash_train_render(p, cfg, ro, rd, z, block_rays=8,
                                interpret=True, noise=noise)
        return jnp.sum(out["rgb"] ** 2) + jnp.sum(out["disp"] ** 2)

    l2, gr2 = jax.value_and_grad(loss)(params, cfg_g2)
    ls, grs = jax.value_and_grad(loss)(params, cfg_s)
    np.testing.assert_allclose(float(ls), float(l2), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(grs), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gr2), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=str(pa))


def test_auto_dispatch_prefers_gen2_at_every_table_size():
    """r4 reversal (BASELINE.md): sorted wins the isolated kernel pair at
    2^19 but LOSES the end-to-end train step 2x (bench.py hashgrid_219_*
    rows), so `encode_mode=auto` must dispatch gen-2 at every T; `sorted`
    stays an explicit opt-in."""
    import dataclasses

    from mvip_tpu.models.nerf_hashgrid import HashGridConfig
    from mvip_tpu.ops.pallas_hashgrid_s import sorted_encode_active

    for log2 in (14, 17, 19, 21):
        cfg = HashGridConfig(log2_table_size=log2)
        assert not sorted_encode_active(cfg), log2
        assert not sorted_encode_active(
            dataclasses.replace(cfg, encode_mode="gen2")
        )
        assert sorted_encode_active(
            dataclasses.replace(cfg, encode_mode="sorted")
        )
