"""Full diffusion inference sampler (text->image / inpainting) — lax.scan loop.

Capability parity with the reference's sampling surface
(`DS_NeRF/guidance/sd_utils.py:601-666`): `produce_latents` (CFG denoising
loop), `decode_latents`, `encode_imgs`, `prompt_to_img`, plus the inpainting
variant (9-channel UNet) the diffusers pipeline provides.

TPU-first: the whole denoising loop is ONE `lax.scan` inside jit — no Python
per-timestep loop, no host sync until the final image.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvip_tpu.guidance import vae as vae_mod
from mvip_tpu.guidance.layers import resize_bilinear, resize_nearest
from mvip_tpu.guidance.scheduler import ddim_step
from mvip_tpu.guidance.sds import GuidanceModels
from mvip_tpu.guidance.unet import apply_unet


def _inference_timesteps(num_train: int, num_steps: int) -> np.ndarray:
    step = num_train // num_steps
    return (np.arange(num_steps) * step).round()[::-1].astype(np.int32)


def produce_latents(
    key,
    gm: GuidanceModels,
    text_embeds: jnp.ndarray,            # [2B, T, C] = [uncond | cond]
    num_steps: int = 50,
    guidance_scale: float = 7.5,
    height: int = 512,
    width: int = 512,
    mask_lat: Optional[jnp.ndarray] = None,     # [B, h, w, 1] for inpainting
    masked_lat: Optional[jnp.ndarray] = None,   # [B, h, w, 4]
    latents: Optional[jnp.ndarray] = None,
):
    """DDIM CFG sampling (`sd_utils.py:601-622`); 9-ch UNet when mask given.

    Not jitted here (GuidanceModels carries static config dataclasses): callers
    jit a closure over `gm`, e.g. `jax.jit(lambda k, te: produce_latents(k, gm, te))`
    — the scan body then compiles once."""
    B = text_embeds.shape[0] // 2
    ds = gm.vae_cfg.downscale
    h, w = height // ds, width // ds
    if latents is None:
        latents = jax.random.normal(key, (B, h, w, gm.vae_cfg.latent_channels))

    ts = jnp.asarray(_inference_timesteps(gm.alphas_cumprod.shape[0], num_steps))
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])

    lc = gm.vae_cfg.latent_channels
    extra = gm.unet_cfg.in_channels - lc
    if extra > 0 and mask_lat is None:
        # 9-ch inpainting UNet driven as text2img: mask=1 everywhere (the whole
        # image is the hole) + zero masked-image latents = free generation
        mask_lat = jnp.ones((B, h, w, extra - lc))
        masked_lat = jnp.zeros((B, h, w, lc))

    def body(lat, t_pair):
        t, t_prev = t_pair
        lat2 = jnp.concatenate([lat, lat], 0)
        if extra > 0:
            m2 = jnp.concatenate([mask_lat, mask_lat], 0)
            ml2 = jnp.concatenate([masked_lat, masked_lat], 0)
            unet_in = jnp.concatenate([lat2, m2, ml2], -1)
        else:
            unet_in = lat2
        t_b = jnp.broadcast_to(t, (2 * B,))
        eps = apply_unet(gm.unet_params, gm.unet_cfg, unet_in, t_b, text_embeds,
                         compute_dtype=jnp.bfloat16)
        eps_u, eps_c = eps[:B], eps[B:]
        eps_hat = eps_u + guidance_scale * (eps_c - eps_u)
        return ddim_step(gm.alphas_cumprod, lat, eps_hat, t, t_prev), None

    latents, _ = jax.lax.scan(body, latents, (ts, ts_prev))
    return latents


def decode_latents(gm: GuidanceModels, latents: jnp.ndarray) -> jnp.ndarray:
    """Latents -> images in [0,1] (`sd_utils.py:624-631`)."""
    imgs = vae_mod.decode(gm.vae_params, gm.vae_cfg, latents)
    return jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)


def encode_imgs(key, gm: GuidanceModels, imgs: jnp.ndarray) -> jnp.ndarray:
    """Images [0,1] -> scaled latents (`sd_utils.py:633-641`)."""
    return vae_mod.encode(gm.vae_params, gm.vae_cfg, 2.0 * imgs - 1.0, key)


def text_to_image(key, gm: GuidanceModels, text_embeds, num_steps: int = 50,
                  guidance_scale: float = 7.5, height: int = 512, width: int = 512):
    """`prompt_to_img` parity (`sd_utils.py:643-666`), embeddings in, uint8 out."""
    lat = produce_latents(key, gm, text_embeds, num_steps=num_steps,
                          guidance_scale=guidance_scale, height=height, width=width)
    imgs = decode_latents(gm, lat)
    return np.asarray(jnp.round(imgs * 255).astype(jnp.uint8))


def inpaint_image(key, gm: GuidanceModels, text_embeds, image, mask,
                  num_steps: int = 50, guidance_scale: float = 7.5,
                  size: int = 512):
    """End-to-end inpainting: the pipeline behavior the reference wraps for SDS.

    image [B,H,W,3] in [0,1]; mask [B,H,W,1] (1 = hole)."""
    k_enc, k_lat = jax.random.split(key)
    ds = gm.vae_cfg.downscale
    img = resize_bilinear(image, size, size)
    m = resize_bilinear(jnp.abs(mask), size, size)
    masked = img * (m < 0.5).astype(img.dtype)
    mask_lat = resize_nearest(m, size // ds, size // ds)
    masked_lat = vae_mod.encode(gm.vae_params, gm.vae_cfg, 2.0 * masked - 1.0, k_enc)
    lat = produce_latents(
        k_lat, gm, text_embeds, num_steps=num_steps, guidance_scale=guidance_scale,
        height=size, width=size, mask_lat=mask_lat, masked_lat=masked_lat,
    )
    return decode_latents(gm, lat)
