"""Custom activations.

`trunc_exp`: exp with a clamped-gradient backward — parity with `_trunc_exp`
(`DS_NeRF/activation.py:5-18`), which clamps the saved input to [-15, 15] in
the backward so fp16/bf16 training can't blow up through exp. The reference
imports it for the tcnn backbone (`run_nerf_helpers_tcnn.py:10`); exposed here
for density parameterizations that use exp instead of relu.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x)


def _fwd(x):
    return jnp.exp(x), x


def _bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_fwd, _bwd)
