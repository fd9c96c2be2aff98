"""Color-only NeRF with a frozen density (alpha) model.

Capability parity with `NeRF_RGB` (`DS_NeRF/run_nerf_helpers.py:159-245`,
wired by `--alpha_model_path`, `run.py:1495-1512`): sigma comes from a frozen
pretrained model under no-grad; only the color branch trains. Used by the
reference to refine appearance on a fixed geometry.

TPU-first: the frozen model is any `(pts, viewdirs) -> raw` callable whose
params are stop-gradiented; the trainable part reuses the PE-MLP color branch.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from mvip_tpu.models.nerf_mlp import NeRFMLPConfig, apply_nerf_mlp, init_nerf_mlp


def init_nerf_rgb(key: jax.Array, cfg: NeRFMLPConfig) -> Dict[str, Any]:
    """Same parameter structure as the full MLP; only color params get grads."""
    return init_nerf_mlp(key, cfg)


def apply_nerf_rgb(
    params: Dict[str, Any],
    cfg: NeRFMLPConfig,
    alpha_fn: Callable[[jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray],
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """rgb from the trainable net, sigma from the FROZEN `alpha_fn`
    (`run_nerf_helpers.py:225-244`: `with torch.no_grad(): sigma = alpha_model`).
    """
    raw = apply_nerf_mlp(params, cfg, pts, viewdirs, compute_dtype)
    sigma = jax.lax.stop_gradient(alpha_fn(pts, viewdirs)[..., 3:4])
    return jnp.concatenate([raw[..., :3], sigma], -1)
