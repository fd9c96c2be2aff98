"""Fused-MXU hash-grid encode (ops/pallas_hashgrid.py) vs the XLA oracle.

Kernel-vs-oracle pattern from the reference's native-kernel tests
(`DS_NeRF/torchsearchsorted/test/test_searchsorted.py:27-44`): the Pallas
kernel (interpret mode on this CPU suite; compiled on TPU in bench runs) must
reproduce `models.nerf_hashgrid.hashgrid_encode` — same hashing, same
trilinear rule — and its custom VJP must match jax.grad of the XLA path.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.models.nerf_hashgrid import dense_levels, hashgrid_encode
from mvip_tpu.ops.pallas_hashgrid import hashgrid_encode_fused


def _setup(L=4, F=2, log2T=10, N=700, seed=0, base=4, finest=64.0):
    T = 1 << log2T
    pls = math.exp2(math.log2(finest / base) / max(L - 1, 1))
    resolutions = tuple(int(math.floor(base * pls**l)) for l in range(L))
    res_arr = jnp.asarray(resolutions, jnp.int32)
    dense = dense_levels(resolutions, T)
    key = jax.random.PRNGKey(seed)
    table = jax.random.uniform(key, (L, T, F), jnp.float32, -0.1, 0.1)
    x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (N, 3), jnp.float32)
    return table, x, res_arr, dense, T


@pytest.mark.parametrize("N", [256, 700])  # 700: exercises block padding
@pytest.mark.parametrize("F", [2, 4])
def test_fused_forward_matches_xla(N, F):
    table, x, res_arr, dense, T = _setup(N=N, F=F)
    ref = hashgrid_encode(table, x, res_arr, T, dense)
    out = hashgrid_encode_fused(
        table, x, res_arr, dense.astype(jnp.int32), T, block=256,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_fused_grads_match_xla():
    table, x, res_arr, dense, T = _setup(N=512)
    g = jax.random.normal(jax.random.PRNGKey(7), (512, table.shape[0] * 2))

    def loss_x(t, xx):
        return jnp.sum(hashgrid_encode(t, xx, res_arr, T, dense) * g)

    def loss_p(t, xx):
        return jnp.sum(
            hashgrid_encode_fused(
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


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_fused_backbone_selectable():
    """--backbone hashgrid_fused builds a fused HashGridConfig; on CPU the
    apply falls back to the identical XLA encode (fused path is TPU-only)."""
    from mvip_tpu.config import Config
    from mvip_tpu.models.nerf_hashgrid import apply_hashgrid_nerf
    from mvip_tpu.train.loop import build_models

    cfg = Config(backbone="hashgrid_fused", N_importance=0)
    coarse_apply, fine_apply, params, backbone, hcfg = build_models(
        cfg, jax.random.PRNGKey(0)
    )
    assert backbone == "hashgrid_fused"
    assert hcfg.fused and hcfg.log2_table_size == 15
    pts = jax.random.uniform(jax.random.PRNGKey(1), (8, 4, 3), minval=-1.0)
    vd = jnp.ones((8, 3)) / math.sqrt(3.0)
    raw = coarse_apply(params["coarse"], pts, vd)
    assert raw.shape == (8, 4, 4)
    assert np.isfinite(np.asarray(raw)).all()


def test_unknown_backbone_rejected():
    from mvip_tpu.config import Config
    from mvip_tpu.train.loop import build_models

    with pytest.raises(ValueError, match="unknown backbone"):
        build_models(Config(backbone="nope"), jax.random.PRNGKey(0))
