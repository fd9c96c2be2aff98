"""Diffusion noise schedule + SDS timestep annealing.

Capability parity with the scheduler surface the reference actually uses
(`DS_NeRF/guidance/sd_utils.py:90-101` — PNDM/DDIM `alphas_cumprod`,
`add_noise` inside `pipe.prepare_latents`, `get_timesteps` with strength=0.75;
`sd_utils.py:363,208,527` — the three timestep-annealing rules).

For SDS only the marginal q(x_t|x_0) matters, so one schedule object serves all
guidance variants; a DDIM `step` is included for the full inference sampler
(`produce_latents`, `sd_utils.py:601-622`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DiffusionSchedule:
    """Stable-Diffusion 'scaled_linear' schedule (beta in sqrt-space)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    t_min_ratio: float = 0.02   # reference t_range=[0.02, 0.98] (`sd_utils.py:46`)
    t_max_ratio: float = 0.98
    strength: float = 0.75      # `sd_utils.py:94`

    @property
    def betas(self) -> np.ndarray:
        s = np.linspace(
            self.beta_start ** 0.5,
            self.beta_end ** 0.5,
            self.num_train_timesteps,
            dtype=np.float64,
        )
        return (s ** 2).astype(np.float32)

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas).astype(np.float32)

    @property
    def min_step(self) -> int:
        return int(self.num_train_timesteps * self.t_min_ratio)

    @property
    def max_step(self) -> int:
        return int(self.num_train_timesteps * self.t_max_ratio)

    def get_timesteps(self, num_inference_steps: int) -> Tuple[np.ndarray, int]:
        """Strength-truncated inference timesteps (descending), diffusers semantics."""
        init = min(int(num_inference_steps * self.strength), num_inference_steps)
        t_start = max(num_inference_steps - init, 0)
        step = self.num_train_timesteps // num_inference_steps
        all_t = (np.arange(num_inference_steps) * step).round()[::-1].astype(np.int64)
        ts = all_t[t_start * 1:]
        return ts, num_inference_steps - t_start


def add_noise(schedule_alphas: jnp.ndarray, x0: jnp.ndarray, noise: jnp.ndarray, t):
    """q(x_t | x_0): sqrt(abar_t) x0 + sqrt(1-abar_t) eps."""
    a = schedule_alphas[t]
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def ddim_step(schedule_alphas: jnp.ndarray, x_t: jnp.ndarray, eps: jnp.ndarray,
              t: jnp.ndarray, t_prev: jnp.ndarray) -> jnp.ndarray:
    """Deterministic DDIM update x_t -> x_{t_prev} (eta=0)."""
    a_t = schedule_alphas[t]
    a_prev = jnp.where(t_prev >= 0, schedule_alphas[jnp.maximum(t_prev, 0)], 1.0)
    x0 = (x_t - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps


# --- SDS timestep annealing -------------------------------------------------


def anneal_sqrt(i, min_step: int, max_step: int, span: float = 20000.0):
    """t = max - (max-min) * sqrt(i/span) — RGB SDS (`sd_utils.py:363`) and
    normal SDS with i offset by normal_start (`sd_utils.py:208`)."""
    i = jnp.maximum(jnp.asarray(i, jnp.float32), 0.0)
    t = max_step - (max_step - min_step) * jnp.sqrt(i / span)
    return jnp.clip(t.astype(jnp.int32), min_step, max_step)


def anneal_linear(i, min_step: int, max_step: int, span: float = 10000.0):
    """t = max - (max-min) * i/span — collaborative SDS (`sd_utils.py:527`).

    NOTE the reference shadows the training iteration with the neighbor-loop
    index there (SURVEY.md §2.5); we expose the iteration explicitly and let the
    caller choose either behavior (`sds.sds_colla_step(..., anneal_over_neighbors=)`).
    """
    i = jnp.maximum(jnp.asarray(i, jnp.float32), 0.0)
    t = max_step - (max_step - min_step) * (i / span)
    return jnp.clip(t.astype(jnp.int32), min_step, max_step)
