"""Hash-grid encoding vs a direct numpy oracle + renderer chunking equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.models.nerf_hashgrid import (
    HashGridConfig,
    _PRIMES,
    dense_levels,
    hashgrid_encode,
)


def np_hashgrid_encode(table, x, resolutions, table_size):
    """Straightforward per-point trilinear oracle (python loops, int64 math)."""
    L, T, F = table.shape
    N = x.shape[0]
    out = np.zeros((N, L * F), np.float64)
    for l, res in enumerate(resolutions):
        dense_ok = (int(res) + 1) ** 3 <= table_size
        for n in range(N):
            pos = x[n] * res
            ip = np.floor(pos).astype(np.int64)
            fr = pos - ip
            acc = np.zeros(F)
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        c = ip + np.array([dx, dy, dz])
                        if dense_ok:
                            res1 = int(res) + 1
                            idx = ((c[0] * res1 + c[1]) * res1 + c[2]) % table_size
                        else:
                            # int32 wrap-around semantics of the device hash
                            h = (
                                np.int32(c[0] * _PRIMES[0])
                                ^ np.int32(np.int32(c[1]) * np.int32(np.uint32(_PRIMES[1]).astype(np.int32)))
                                ^ np.int32(np.int32(c[2]) * np.int32(np.uint32(_PRIMES[2]).astype(np.int32)))
                            )
                            idx = int(h) % table_size
                        w = 1.0
                        for d, o in zip(fr, (dx, dy, dz)):
                            w *= d if o else (1.0 - d)
                        acc += w * table[l, idx]
            out[n, l * F : (l + 1) * F] = acc
    return out


def test_hashgrid_encode_matches_numpy_oracle(key):
    cfg = HashGridConfig(n_levels=3, log2_table_size=8, base_resolution=4,
                         bound=1.0, finest_resolution=16.0)
    table = jax.random.normal(key, (3, cfg.table_size, 2))
    x = jax.random.uniform(jax.random.fold_in(key, 1), (16, 3))
    res = jnp.asarray(cfg.resolutions, jnp.int32)
    got = np.asarray(
        hashgrid_encode(table, x, res, cfg.table_size,
                        dense_levels(cfg.resolutions, cfg.table_size))
    )
    expect = np_hashgrid_encode(np.asarray(table), np.asarray(x),
                                cfg.resolutions, cfg.table_size)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_render_rays_chunked_matches_unchunked(key):
    from mvip_tpu.models.nerf_mlp import NeRFMLPConfig, apply_nerf_mlp, init_nerf_mlp
    from mvip_tpu.render.renderer import (
        RenderOptions,
        render_rays,
        render_rays_chunked,
    )

    cfg = NeRFMLPConfig(depth=2, width=16, multires=2, multires_views=2)
    params = init_nerf_mlp(key, cfg)
    model = lambda pts, vd: apply_nerf_mlp(params, cfg, pts, vd)
    n = 50  # NOT a multiple of the chunk: exercises padding + slice-back
    ro = jnp.zeros((n, 3)).at[:, 2].set(4.0)
    d = jax.random.normal(key, (n, 3)).at[:, 2].add(-2.0)
    rd = d / jnp.linalg.norm(d, -1, keepdims=True)
    opts = RenderOptions(n_samples=8, n_importance=0, perturb=0.0,
                         raw_noise_std=0.0)

    full = render_rays(None, ro, rd, 2.0, 6.0, model, None, opts)
    chunked = render_rays_chunked(None, ro, rd, 2.0, 6.0, model, None, opts,
                                  chunk=16)
    for k in ("rgb", "disp", "depth"):
        np.testing.assert_allclose(np.asarray(chunked[k]), np.asarray(full[k]),
                                   atol=1e-5)
