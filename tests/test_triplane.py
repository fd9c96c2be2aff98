"""Triplane (VM-factorized) backbone: shapes, interpolation math, grad flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.models.nerf_triplane import (
    TriplaneConfig,
    apply_triplane_nerf,
    init_triplane_nerf,
    triplane_encode,
    _bilinear_plane,
    _linear_line,
)


def test_bilinear_plane_matches_manual(key):
    plane = jax.random.normal(key, (8, 8, 4))
    u = jnp.array([0.3, 0.99, 0.0])
    v = jnp.array([0.7, 0.01, 0.0])
    out = _bilinear_plane(plane, u, v)
    # manual for the first query
    pu, pv = 0.3 * 7, 0.7 * 7
    iu, iv = int(pu), int(pv)
    fu, fv = pu - iu, pv - iv
    expect = (
        plane[iu, iv] * (1 - fu) * (1 - fv)
        + plane[iu, iv + 1] * (1 - fu) * fv
        + plane[iu + 1, iv] * fu * (1 - fv)
        + plane[iu + 1, iv + 1] * fu * fv
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(expect), rtol=1e-5)
    # corner query hits the exact grid value
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(plane[0, 0]), rtol=1e-6)


def test_linear_line_endpoints(key):
    line = jax.random.normal(key, (16, 3))
    out = _linear_line(line, jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(line[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(line[-1]), rtol=1e-5)


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_triplane_nerf_contract_and_grads(key):
    cfg = TriplaneConfig(plane_res=16, line_res=16, n_comp=4, bound=4.0,
                         sigma_hidden=16, color_hidden=16)
    params = init_triplane_nerf(key, cfg)
    pts = jax.random.uniform(key, (10, 7, 3), minval=-4, maxval=4)
    vd = jax.random.normal(key, (10, 3))
    vd = vd / jnp.linalg.norm(vd, -1, keepdims=True)
    raw = apply_triplane_nerf(params, cfg, pts, vd)
    assert raw.shape == (10, 7, 4)
    assert np.isfinite(np.asarray(raw)).all()

    g = jax.grad(lambda p: jnp.sum(apply_triplane_nerf(p, cfg, pts, vd) ** 2))(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
    # every plane and line receives gradient
    for i in range(3):
        assert float(jnp.abs(g["planes"][i]).sum()) > 0
        assert float(jnp.abs(g["lines"][i]).sum()) > 0


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_triplane_fits_signal(key):
    """A few Adam steps reduce a toy density-field regression loss."""
    import optax

    cfg = TriplaneConfig(plane_res=16, line_res=16, n_comp=8, bound=1.0,
                         sigma_hidden=16, color_hidden=16)
    params = init_triplane_nerf(key, cfg)
    pts = jax.random.uniform(key, (256, 3), minval=-1, maxval=1)
    vd = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (256, 1))
    target = jnp.sin(3.0 * pts.sum(-1))

    opt = optax.adam(1e-2)
    ostate = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss(p):
            raw = apply_triplane_nerf(p, cfg, pts, vd)
            return jnp.mean((raw[:, 3] - target) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    params, ostate, l0 = step(params, ostate)
    for _ in range(30):
        params, ostate, l = step(params, ostate)
    assert float(l) < float(l0) * 0.7
