"""Instant-NGP-style hash-grid NeRF — the reference's default backbone.

Capability parity with `NeRF_TCNN` (`DS_NeRF/run_nerf_helpers_tcnn.py:13-112`), which
wraps tiny-cuda-nn (C++/CUDA): multiresolution HashGrid encoding (16 levels, 2
features/level, 2^19 table, base resolution 16, per-level scale from max res
2048·bound), a 2×64 ReLU sigma net emitting (sigma, 15 geo features), degree-4
spherical-harmonics direction encoding, and a 3×64 color net. Positions are mapped
from [-bound, bound] to [0, 1]; output is raw (rgb logits, sigma) consumed by the
compositor exactly like the MLP backbone.

TPU-first design:
  * the hash tables live as one [L, T, F] array; the 8-corner trilinear gather is a
    batched `take` (XLA gather) with a Pallas fused-gather kernel on the hot path
    (`mvip_tpu.ops.pallas.hashgrid`),
  * all 16 levels are evaluated in one `vmap` — a single fused program, no per-level
    Python loop,
  * the tiny MLPs are plain MXU matmuls on [N, C] blocks (tcnn's "FullyFusedMLP" is
    a VMEM-resident weight trick; on TPU, XLA keeps 64-wide weights in registers).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    bound: float = 100.0
    finest_resolution: float = 0.0  # 0 => 2048 * bound (tcnn parity)
    geo_feat_dim: int = 15
    sigma_hidden: int = 64
    sigma_layers: int = 2
    color_hidden: int = 64
    color_layers: int = 3
    sh_degree: int = 4
    table_dtype: Any = jnp.float32
    # Fused-MXU encode (ops/pallas_hashgrid.py): gathers as one-hot matmuls +
    # in-vreg lane selects, backward scatter as transposed matmuls — ~20x the
    # XLA gather/scatter encode on TPU. Requires log2_table_size <= 16 (the
    # one-hot slab cost is linear in table size). On CPU the XLA path runs
    # instead (identical semantics).
    fused: bool = False
    fused_block: int = 512
    fused_dtype: str = "float32"   # one-hot matmul operand dtype; bfloat16
                                   # rounds table reads like tcnn's fp16
    # Encode algorithm for the fused path: "gen2" = transposed one-hot matmul
    # (linear in T, ops/pallas_hashgrid_t.py), "sorted" = sorted-slab gather
    # (T-independent matmuls + 3 lax.sorts, ops/pallas_hashgrid_s.py),
    # "auto" = gen2 at every T: the sorted path wins the isolated kernel
    # pair at 2^19 but LOSES the end-to-end train step 2x (sort cost does
    # not overlap away — bench.py hashgrid_219_* rows, BASELINE.md r4).
    encode_mode: str = "auto"

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def per_level_scale(self) -> float:
        finest = self.finest_resolution or 2048.0 * self.bound
        return math.exp2(
            math.log2(finest / self.base_resolution) / max(self.n_levels - 1, 1)
        )

    @property
    def resolutions(self) -> tuple:
        return tuple(
            int(math.floor(self.base_resolution * self.per_level_scale**l))
            for l in range(self.n_levels)
        )

    @property
    def enc_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def sh_dim(self) -> int:
        return self.sh_degree**2


def _he_uniform(key, fan_in, fan_out, dtype=jnp.float32):
    bound = math.sqrt(6.0 / fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
        "b": jnp.zeros((fan_out,), dtype),
    }


def _mlp_init(key, sizes, dtype=jnp.float32):
    keys = jax.random.split(key, len(sizes) - 1)
    return [
        _he_uniform(k, a, b, dtype) for k, a, b in zip(keys, sizes[:-1], sizes[1:])
    ]


def _mlp_apply(layers, x, compute_dtype=None):
    for i, p in enumerate(layers):
        w = p["w"]
        if compute_dtype is not None:
            x, w = x.astype(compute_dtype), w.astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + p["b"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def init_hashgrid_nerf(key: jax.Array, cfg: HashGridConfig) -> Dict[str, Any]:
    k_table, k_sigma, k_color = jax.random.split(key, 3)
    table = jax.random.uniform(
        k_table,
        (cfg.n_levels, cfg.table_size, cfg.n_features),
        cfg.table_dtype,
        -1e-4,
        1e-4,
    )
    sigma_sizes = (
        [cfg.enc_dim]
        + [cfg.sigma_hidden] * (cfg.sigma_layers - 1)
        + [1 + cfg.geo_feat_dim]
    )
    color_sizes = (
        [cfg.sh_dim + cfg.geo_feat_dim]
        + [cfg.color_hidden] * (cfg.color_layers - 1)
        + [3]
    )
    return {
        "table": table,
        "sigma_net": _mlp_init(k_sigma, sigma_sizes),
        "color_net": _mlp_init(k_color, color_sizes),
    }


def _hash_corners(ipos: jnp.ndarray, resolution: jnp.ndarray, table_size: int,
                  use_dense: jnp.ndarray):
    """ipos [N, 8, 3] int32 corner coords -> [N, 8] table indices.

    Dense indexing when the level grid fits the table, spatial hashing otherwise
    — the instant-NGP rule, matching tcnn's GridEncoding. The dense/hash
    decision (`use_dense`) is made STATICALLY per level in Python ints:
    (res+1)^3 overflows int32 on device for fine levels (e.g. 204800^3 wraps to
    exactly 0), which silently flipped the finest levels to wrapped dense
    indexing with structured collisions.
    """
    res1 = resolution + 1
    dense = (ipos[..., 0] * res1 + ipos[..., 1]) * res1 + ipos[..., 2]
    h = (
        ipos[..., 0] * _PRIMES[0]
        ^ ipos[..., 1] * jnp.uint32(_PRIMES[1]).astype(jnp.int32)
        ^ ipos[..., 2] * jnp.uint32(_PRIMES[2]).astype(jnp.int32)
    )
    hashed = jnp.remainder(h, table_size)
    return jnp.where(use_dense, jnp.remainder(dense, table_size), hashed)


def hashgrid_encode(
    table: jnp.ndarray, x: jnp.ndarray, resolutions: jnp.ndarray, table_size: int,
    use_dense: jnp.ndarray = None,
) -> jnp.ndarray:
    """x [N, 3] in [0, 1] -> [N, L*F] multiresolution features (trilinear).

    `use_dense` [L] bool: per-level dense-vs-hash decision, computed by the
    caller in Python ints (see `dense_levels`)."""
    if use_dense is None:
        use_dense = dense_levels(
            [int(r) for r in np.asarray(resolutions)], table_size
        )

    corner_offsets = jnp.stack(
        jnp.meshgrid(*([jnp.arange(2)] * 3), indexing="ij"), -1
    ).reshape(8, 3)  # [8, 3]

    def level(tbl, res, dense_ok):
        pos = x * res  # [N, 3]
        # clamp so clipped boundary points (x == 1.0) keep corners <= res:
        # beyond that, dense indices leave the (res+1)^3 range and alias
        # after the table wrap (mirrors ops/pallas_hashgrid._corner_geometry)
        ipos = jnp.minimum(jnp.floor(pos).astype(jnp.int32), res - 1)
        frac = pos - ipos
        corners = ipos[:, None, :] + corner_offsets[None]          # [N, 8, 3]
        idx = _hash_corners(corners, res, table_size, dense_ok)    # [N, 8]
        feats = jnp.take(tbl, idx, axis=0)                         # [N, 8, F]
        w = jnp.where(corner_offsets[None], frac[:, None, :], 1.0 - frac[:, None, :])
        w = jnp.prod(w, -1)                                        # [N, 8]
        return jnp.sum(feats * w[..., None].astype(feats.dtype), 1)  # [N, F]

    feats = jax.vmap(level)(table, resolutions, use_dense)  # [L, N, F]
    return jnp.moveaxis(feats, 0, 1).reshape(x.shape[0], -1)


def _fused_available(cfg: "HashGridConfig") -> bool:
    """Fused-MXU encode runs on TPU for tables up to 2^MAX_FUSED_LOG2_T
    (= tcnn's 2^19 since r2; the point block auto-shrinks so the one-hot slab
    fits VMEM — cost stays linear in T, so 2^15 remains the fast default)."""
    from mvip_tpu.ops.pallas_hashgrid_t import MAX_FUSED_LOG2_T

    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return (on_tpu and cfg.log2_table_size <= MAX_FUSED_LOG2_T
            and 128 % cfg.n_features == 0)


def dense_levels(resolutions, table_size: int) -> jnp.ndarray:
    """[L] bool: (res+1)^3 <= table_size evaluated in overflow-free Python ints."""
    return jnp.asarray(
        [(int(r) + 1) ** 3 <= table_size for r in resolutions], jnp.bool_
    )


def sh_encoding(d: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical-harmonics basis up to `degree` (tcnn SphericalHarmonics parity,
    `run_nerf_helpers_tcnn.py:64-69`). d [N, 3] unit directions -> [N, degree^2]."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree > 1:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree > 2:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
        ]
    if degree > 3:
        out += [
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ]
    return jnp.stack(out, -1)


def apply_hashgrid_nerf(
    params: Dict[str, Any],
    cfg: HashGridConfig,
    pts: jnp.ndarray,
    viewdirs: jnp.ndarray = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """pts [..., 3] world positions in [-bound, bound]; viewdirs [..., 3] unit dirs.

    Returns raw [..., 4] (rgb logits, sigma) — same contract as the MLP backbone.
    """
    shape = pts.shape[:-1]
    x = pts.reshape(-1, 3)
    x01 = jnp.clip((x + cfg.bound) / (2.0 * cfg.bound), 0.0, 1.0)
    resolutions = jnp.asarray(cfg.resolutions, jnp.int32)
    use_dense = dense_levels(cfg.resolutions, cfg.table_size)
    if cfg.fused and _fused_available(cfg):
        from mvip_tpu.ops.pallas_hashgrid_s import sorted_encode_active

        if sorted_encode_active(cfg):
            # sorted-slab (gen-3) kernel: T-independent gather cost — the
            # tcnn-capacity (2^19) path (ops/pallas_hashgrid_s.py)
            from mvip_tpu.ops.pallas_hashgrid_s import hashgrid_encode_sorted

            enc = hashgrid_encode_sorted(
                params["table"].astype(jnp.float32), x01, resolutions,
                use_dense.astype(jnp.int32), cfg.table_size,
            )
        else:
            # transposed (points-on-lanes) kernel: 15.0ms fwd / 22.1ms fwd+bwd
            # at the canonical 131k-pt load vs 33.6/43.0 for the first-gen
            # layout and 251ms for XLA (tools/bench_encode.py, one v5e, 2^15)
            from mvip_tpu.ops.pallas_hashgrid_t import hashgrid_encode_fused_t

            enc = hashgrid_encode_fused_t(
                params["table"].astype(jnp.float32), x01, resolutions,
                use_dense.astype(jnp.int32), cfg.table_size,
                block=max(cfg.fused_block, 1024),
                compute_dtype=cfg.fused_dtype, res_static=cfg.resolutions,
            )
    else:
        enc = hashgrid_encode(
            params["table"], x01, resolutions, cfg.table_size, use_dense,
        )
    h = _mlp_apply(params["sigma_net"], enc.astype(jnp.float32), compute_dtype)
    sigma, geo = h[..., :1], h[..., 1:]

    if viewdirs is None:
        raise ValueError("hash-grid NeRF requires view directions")
    v = jnp.broadcast_to(
        viewdirs[..., None, :] if viewdirs.ndim < pts.ndim else viewdirs, pts.shape
    ).reshape(-1, 3)
    sh = sh_encoding(v, cfg.sh_degree)
    rgb = _mlp_apply(
        params["color_net"], jnp.concatenate([sh, geo], -1), compute_dtype
    )
    raw = jnp.concatenate([rgb, sigma], -1)
    return raw.reshape(*shape, 4)
