"""Loss primitives (`DS_NeRF/run_nerf_helpers.py:15-18`)."""

from __future__ import annotations

import jax.numpy as jnp


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def img2l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def weighted_mse(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Reprojection-weighted depth loss (reference `--weighted_loss`)."""
    return jnp.mean(w * (x - y) ** 2)
