"""Extended SDS variants: depth / RGBD / latent / pixel-space / novel-view."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.guidance.sds import SDSConfig, make_guidance_models
from mvip_tpu.guidance.sds_variants import (
    sds_depth_step,
    sds_latent_step,
    sds_novel_view_step,
    sds_pixel_step,
    sds_rgbd_step,
)
from mvip_tpu.guidance.unet import UNetConfig, init_unet, tiny_unet_config
from mvip_tpu.guidance.vae import init_vae, tiny_vae_config


@pytest.fixture
def tiny(key):
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    cfg = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))
    return gm, cfg, te


def _grad_flows(loss_fn, x):
    g = jax.grad(loss_fn)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
    return g


def test_sds_depth_step(key, tiny):
    gm, cfg, te = tiny
    depth = jax.random.uniform(key, (1, 12, 12, 1))
    mask = jnp.ones((1, 12, 12, 1))
    _grad_flows(lambda d: sds_depth_step(key, gm, cfg, 10, d, mask, te), depth)


def test_sds_rgbd_step(key, tiny):
    gm, cfg, te = tiny
    rgb = jax.random.uniform(key, (1, 12, 12, 3))
    depth = jax.random.uniform(key, (1, 12, 12, 1))
    mask = jnp.ones((1, 12, 12, 1))
    # gradient must reach BOTH rgb and depth
    _grad_flows(lambda r: sds_rgbd_step(key, gm, cfg, 10, r, depth, mask, te), rgb)
    _grad_flows(lambda d: sds_rgbd_step(key, gm, cfg, 10, rgb, d, mask, te), depth)


def test_sds_latent_step(key, tiny):
    gm, cfg, te = tiny
    img = jax.random.uniform(key, (1, 12, 12, 3))
    mask = jnp.ones((1, 12, 12, 1))
    _grad_flows(lambda im: sds_latent_step(key, gm, cfg, 10, im, mask, te), img)


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_sds_pixel_step(key):
    """Pixel-space UNet (in=3): gradient lands directly on the image."""
    ucfg = dataclasses.replace(tiny_unet_config(), in_channels=3, out_channels=3)
    vcfg = tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    cfg = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))
    img = jax.random.uniform(key, (1, 12, 12, 3))
    _grad_flows(
        lambda im: sds_pixel_step(key, gm, cfg, 10, im, te, image_size=16), img
    )


def test_sds_novel_view_step(key):
    """8-channel image-conditioned UNet (zero123 layout)."""
    vcfg = tiny_vae_config()
    ucfg = dataclasses.replace(
        tiny_unet_config(), in_channels=2 * vcfg.latent_channels
    )
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg), ucfg, vcfg)
    cfg = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    lat = cfg.latent_size // vcfg.downscale
    cond_lat = jax.random.normal(key, (1, lat, lat, vcfg.latent_channels))
    cond_emb = jax.random.normal(key, (2, 5, ucfg.cross_attention_dim))
    img = jax.random.uniform(key, (1, 12, 12, 3))
    _grad_flows(
        lambda im: sds_novel_view_step(key, gm, cfg, 10, im, cond_lat, cond_emb),
        img,
    )


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_sds_rgb_perpneg_step(key, tiny):
    from mvip_tpu.guidance.sds_variants import sds_rgb_perpneg_step

    gm, cfg, _ = tiny
    C = gm.unet_cfg.cross_attention_dim
    te_dirs = jax.random.normal(key, (4, 5, C))   # uncond + pos + 2 negatives
    w = jnp.array([1.0, -0.5, -0.3])
    img = jax.random.uniform(key, (1, 12, 12, 3))
    mask = jnp.ones((1, 12, 12, 1))
    _grad_flows(
        lambda im: sds_rgb_perpneg_step(key, gm, cfg, 10, im, mask, te_dirs, w),
        img,
    )
