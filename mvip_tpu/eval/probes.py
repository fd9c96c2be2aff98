"""Diagnostic probes: sigma-along-ray sampling and visualization.

Capability parity with the reference's test-ray tooling:
- `sample_sigma`  <- `run_nerf_helpers.py:463-476` (query sigma/rgb along one ray)
- `visualize_sigma` <- `run_nerf_helpers.py:479-484` (sigma(z) plot)
- `render_test_ray` <- `run.py:1443-1471` + the `--render_test_ray` branch
  (`run.py:586-599`). NOTE the reference's own path crashes on a 5-of-6 unpack
  (SURVEY.md §2.5); this implementation is the working equivalent.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvip_tpu.ops.compositing import composite
from mvip_tpu.ops.sampling import stratified_z_vals


def sample_sigma(
    key: Optional[jax.Array],
    rays_o: jnp.ndarray,      # [N, 3]
    rays_d: jnp.ndarray,      # [N, 3]
    near,
    far,
    model_fn: Callable,
    n_samples: int = 64,
    perturb: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    """Query raw (rgb, sigma) along rays; returns z_vals + per-sample values."""
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z_vals = stratified_z_vals(
        key, rays_o.shape[0], n_samples, near, far, perturb=perturb,
        dtype=rays_o.dtype,
    )
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    raw = model_fn(pts, viewdirs)
    out = composite(raw, z_vals, rays_d, None, 0.0, False, False)
    return {
        "z_vals": z_vals,
        "sigma": jax.nn.relu(raw[..., 3]),
        "rgb": jax.nn.sigmoid(raw[..., :3]),
        "weights": out.weights,
        "depth": out.depth,
    }


def visualize_sigma(sigma: np.ndarray, z_vals: np.ndarray, path: str) -> None:
    """sigma(z) plot for one ray (`run_nerf_helpers.py:479-484`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    plt.plot(np.asarray(z_vals).ravel(), np.asarray(sigma).ravel())
    plt.xlabel("z")
    plt.ylabel("sigma")
    plt.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def render_test_ray(
    key,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near,
    far,
    model_fn: Callable,
    n_samples: int = 64,
    savedir: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Probe a batch of rays and optionally dump sigma plots for the first few."""
    out = sample_sigma(key, rays_o, rays_d, near, far, model_fn, n_samples)
    host = {k: np.asarray(v) for k, v in out.items()}
    if savedir:
        import os

        os.makedirs(savedir, exist_ok=True)
        for i in range(min(4, host["sigma"].shape[0])):
            visualize_sigma(
                host["sigma"][i], host["z_vals"][i],
                os.path.join(savedir, f"sigma_ray{i}.png"),
            )
    return host
