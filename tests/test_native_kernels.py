"""Native-path parity tests: C++ searchsorted oracle + Pallas fused sampler.

Mirrors the reference's kernel test strategy
(`torchsearchsorted/test/test_searchsorted.py:27-44`): parametrized shape
product, random repeats, exact equality against a numpy oracle; plus the fused
sampler vs the pure-JAX `sample_pdf` (which itself golden-matches the reference
math).
"""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.ops.sampling import sample_pdf

requires_gxx = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


def numpy_searchsorted(a, v, side):
    ba, bv = a.shape[0], v.shape[0]
    rows = max(ba, bv)
    out = np.empty((rows, v.shape[1]), np.int64)
    for r in range(rows):
        out[r] = np.searchsorted(a[r % ba if ba > 1 else 0],
                                 v[r % bv if bv > 1 else 0], side=side)
    return out


@requires_gxx
@pytest.mark.parametrize("ba,bv", [(1, 8), (8, 1), (8, 8)])
@pytest.mark.parametrize("n_a,n_v", [(1, 1), (50, 12), (500, 120)])
@pytest.mark.parametrize("side", ["left", "right"])
def test_cpp_searchsorted_vs_numpy(rng, ba, bv, n_a, n_v, side):
    from mvip_tpu import native

    for _ in range(5):
        a = np.sort(rng.normal(size=(ba, n_a)).astype(np.float32), axis=1)
        v = rng.normal(size=(bv, n_v)).astype(np.float32)
        np.testing.assert_array_equal(
            native.searchsorted(a, v, side), numpy_searchsorted(a, v, side)
        )


@requires_gxx
def test_cpp_searchsorted_f64(rng):
    from mvip_tpu import native

    a = np.sort(rng.normal(size=(4, 64)), axis=1)  # float64
    v = rng.normal(size=(4, 32))
    np.testing.assert_array_equal(
        native.searchsorted(a, v, "right"), numpy_searchsorted(a, v, "right")
    )


@pytest.mark.parametrize("R,B,S", [(4, 63, 64), (128, 63, 64), (100, 31, 17)])
def test_pallas_sample_pdf_matches_reference(key, R, B, S):
    """Fused kernel (interpret mode on CPU, compiled on TPU) == pure-JAX sample_pdf."""
    from mvip_tpu.ops.pallas_sampling import sample_pdf_pallas

    k1, k2, k3 = jax.random.split(key, 3)
    bins = jnp.sort(jax.random.uniform(k1, (R, B), minval=2.0, maxval=6.0), -1)
    weights = jax.random.uniform(k2, (R, B - 1))
    u = jax.random.uniform(k3, (R, S))

    expect = sample_pdf(bins, weights, S, u=u)
    interpret = jax.devices()[0].platform != "tpu"
    got = sample_pdf_pallas(bins, weights, S, u=u, interpret=interpret)
    # the kernel's matmul prefix-sum orders additions differently from cumsum;
    # a u landing within float-eps of a CDF edge interpolates from the adjacent
    # bin (continuous there, so the value error stays tiny)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-4)


def test_pallas_sample_pdf_det_and_random(key):
    from mvip_tpu.ops.pallas_sampling import sample_pdf_pallas

    bins = jnp.sort(jax.random.uniform(key, (16, 63), minval=0.0, maxval=1.0), -1)
    weights = jax.random.uniform(jax.random.fold_in(key, 1), (16, 62))
    interpret = jax.devices()[0].platform != "tpu"

    det_k = sample_pdf_pallas(bins, weights, 32, det=True, interpret=interpret)
    det_ref = sample_pdf(bins, weights, 32, det=True)
    np.testing.assert_allclose(np.asarray(det_k), np.asarray(det_ref), atol=2e-4)

    r = sample_pdf_pallas(bins, weights, 32, key=key, interpret=interpret)
    assert np.asarray((r >= bins.min()) & (r <= bins.max())).all()
