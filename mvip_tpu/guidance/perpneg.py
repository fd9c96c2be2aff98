"""Perp-Neg: perpendicular aggregation of directional noise predictions.

Capability parity with `DS_NeRF/guidance/perpneg_utils.py:4-48` and the
directional text-embedding interpolation in `DS_NeRF/nerf/utils.py:8-74`
(`get_pos_neg_text_embeddings`, `adjust_text_embeddings`). In the reference
these are imported but not called on the active path (SURVEY.md §2.4); they are
part of the capability surface for azimuth-conditioned SDS.

Vectorized: no per-batch Python loops — a masked einsum over the K directional
prompts.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax.numpy as jnp


def get_perpendicular_component(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x minus its projection onto y (flattened dot; `perpneg_utils.py:4-6`)."""
    num = jnp.sum(x * y)
    den = jnp.maximum(jnp.sum(y * y), 1e-6)
    return x - (num / den) * y


def weighted_perpendicular_aggregator(delta_eps: jnp.ndarray, weights: jnp.ndarray,
                                      batch_size: int) -> jnp.ndarray:
    """delta_eps [B*K, ...], weights [B*K] -> [B, ...]
    (`perpneg_utils.py:17-48`): main positive + sum_k w_k * perp(delta_k, main).
    """
    K = delta_eps.shape[0] // batch_size
    d = delta_eps.reshape(K, batch_size, -1)     # [K, B, D]
    w = weights.reshape(K, batch_size)           # [K, B]
    main = d[0]                                  # [B, D]
    num = jnp.sum(d[1:] * main[None], -1)        # [K-1, B]
    den = jnp.maximum(jnp.sum(main * main, -1), 1e-6)[None]
    perp = d[1:] - (num / den)[..., None] * main[None]
    active = (jnp.abs(w[1:]) > 1e-4).astype(d.dtype)
    out = main + jnp.sum((w[1:] * active)[..., None] * perp, 0)
    return out.reshape((batch_size,) + delta_eps.shape[1:])


def get_pos_neg_text_embeddings(
    embeddings: Dict[str, jnp.ndarray],   # 'front'/'side'/'back' [1, T, C]
    azimuth_val: float,
    front_decay_factor: float = 2.0,
    side_decay_factor: float = 2.0,
    negative_w: float = -2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Azimuth-interpolated positive + weighted negative directional embeddings
    (`nerf/utils.py:34-74`). Host-side (azimuth is a python float per pose draw).
    """
    if -90 <= azimuth_val < 90:
        r = 1 - azimuth_val / 90 if azimuth_val >= 0 else 1 + azimuth_val / 90
        pos = r * embeddings["front"] + (1 - r) * embeddings["side"]
        text_z = jnp.concatenate([pos, embeddings["front"], embeddings["side"]], 0)
        front_neg = 0.0 if r > 0.8 else math.exp(-r * front_decay_factor) * negative_w
        side_neg = 0.0 if r < 0.2 else math.exp(-(1 - r) * side_decay_factor) * negative_w
        weights = jnp.array([1.0, front_neg, side_neg])
    else:
        r = (1 - (azimuth_val - 90) / 90 if azimuth_val >= 0
             else 1 + (azimuth_val + 90) / 90)
        pos = r * embeddings["side"] + (1 - r) * embeddings["back"]
        text_z = jnp.concatenate([pos, embeddings["side"], embeddings["front"]], 0)
        front_neg = negative_w
        side_neg = 0.0 if r > 0.8 else math.exp(-r * side_decay_factor) * negative_w / 2
        weights = jnp.array([1.0, side_neg, front_neg])
    return text_z, weights


def adjust_text_embeddings(embeddings: Dict[str, jnp.ndarray], azimuths,
                           **kw) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch + interleave directional embeddings (`nerf/utils.py:8-32`)."""
    zs, ws = [], []
    for az in azimuths:
        z, w = get_pos_neg_text_embeddings(embeddings, float(az), **kw)
        zs.append(z)
        ws.append(w)
    K = max(z.shape[0] for z in zs)
    text, weights = [], []
    for i in range(K):
        for z, w in zip(zs, ws):
            text.append(z[i] if i < z.shape[0] else z[0])
            weights.append(w[i] if i < w.shape[0] else jnp.zeros(()))
    return jnp.stack(text, 0), jnp.stack(weights, 0)
