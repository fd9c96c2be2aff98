"""mvip_tpu — TPU-native multi-view 3D NeRF inpainting framework.

A brand-new JAX / XLA / Pallas / pjit implementation of the capability surface of
MVIP-NeRF (CVPR 2024, reference: chenhonghua/MVIP-NeRF): depth-supervised NeRF
fitting of masked multi-view scenes with score-distillation (SDS) guidance from a
Stable-Diffusion inpainting prior on rendered RGB, rendered normal maps, and
collaboratively across neighboring views.

Design is TPU-first, not a port:
  * device-resident ray pools sampled with `jax.random` inside one jitted train step
    (no host DataLoader loop),
  * static shapes everywhere; chunking via `lax.map` where needed,
  * data parallelism over a `jax.sharding.Mesh` (ICI/DCN collectives inserted by XLA),
  * Pallas megakernels for the render inner loop (fused hierarchical sampling,
    hash-grid encoding, fused MLP eval),
  * bf16-friendly layouts sized for the MXU.
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persist compiled executables across processes. The tunneled-TPU remote
    compiler takes minutes cold for the fused train step; the persistent cache
    cuts warm starts to seconds."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "MVIP_JAX_CACHE", os.path.expanduser("~/.cache/mvip_jax_cache")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


_enable_compilation_cache()


def __getattr__(name):
    """Lazy public API (imports stay light until first use)."""
    if name == "Config":
        from mvip_tpu.config import Config

        return Config
    if name == "load_config":
        from mvip_tpu.config import load_config

        return load_config
    if name == "train":
        from mvip_tpu.train.loop import train

        return train
    if name == "setup_experiment":
        from mvip_tpu.train.loop import setup_experiment

        return setup_experiment
    raise AttributeError(f"module 'mvip_tpu' has no attribute {name!r}")
