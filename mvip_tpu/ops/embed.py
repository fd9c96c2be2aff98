"""Sinusoidal positional encoding.

Capability parity with the reference `Embedder` (`DS_NeRF/run_nerf_helpers.py:22-70`):
include-input, log- or linearly-sampled frequency bands, interleaved sin/cos per band
(the reference appends `sin(x*f), cos(x*f)` per frequency — we keep that channel order
so torch-trained weights port bit-for-bit).

TPU-first: one fused broadcast+trig instead of a Python list of lambdas; output is a
single concatenated array that XLA fuses straight into the first matmul.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def embedding_dim(input_dims: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dims * (include_input + 2 * num_freqs)


@functools.partial(jnp.vectorize, signature="(d)->(e)", excluded=(1, 2, 3))
def _encode(x, num_freqs, include_input, log_sampling):
    d = x.shape[-1]
    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, num_freqs - 1.0, num_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (num_freqs - 1.0), num_freqs, dtype=x.dtype)
    xb = x[None, :] * freqs[:, None]                      # [F, d]
    # interleave sin/cos per frequency: [sin f0 | cos f0 | sin f1 | ...]
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=1)   # [F, 2, d]
    enc = enc.reshape(2 * num_freqs * d)
    if include_input:
        enc = jnp.concatenate([x, enc])
    return enc


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    include_input: bool = True,
    log_sampling: bool = True,
    order: str = "grouped",
) -> jnp.ndarray:
    """Encode [..., d] -> [..., d*(include_input + 2*num_freqs)].

    `num_freqs == 0` returns the identity (reference `i_embed == -1`).

    order:
      "grouped" (default, TPU-fast): [x | sin(f0..fL) | cos(f0..fL)] — two
        flat trig calls + one concat; no [.., F, 2, d] stacking (which costs
        more than the whole NeRF matmul chain on TPU — lane-padded tiny dims).
      "interleaved": the reference's channel order
        [x | sin f0 | cos f0 | sin f1 | ...] (`run_nerf_helpers.py:47-50`) —
        needed only when porting torch-trained NeRF weights bit-for-bit.
    The two differ by a fixed feature permutation; fresh training is identical.
    """
    if num_freqs == 0:
        return x
    if order == "interleaved":
        return _encode(x, num_freqs, include_input, log_sampling)
    d = x.shape[-1]
    if log_sampling:
        freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (num_freqs - 1.0), num_freqs, dtype=x.dtype)
    y = (x[..., None, :] * freqs[..., :, None]).reshape(*x.shape[:-1], num_freqs * d)
    parts = ([x] if include_input else []) + [jnp.sin(y), jnp.cos(y)]
    return jnp.concatenate(parts, -1)
