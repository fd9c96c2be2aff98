"""Extended SDS variants — the reference's legacy/experimental guidance surface.

Capability parity with `DS_NeRF/guidance/sd.py` (never imported on the active
path — SURVEY.md §2.4 — but part of the capability surface), `if_utils.py`
(DeepFloyd-IF pixel-space SDS) and `zero123_utils.py` (novel-view SDS):

- `sds_depth_step`  <- `train_step_sd_depth` (`sd.py:628-805`): SDS on the
  rendered depth map expanded to 3 channels; hardcoded guidance scale 25.
- `sds_rgbd_step`   <- `train_step_sd_rgbd` (`sd.py:808-1180`): SDS on
  [rgb | depth] (depth replaces the blue channel pathway via a 4->3 slice in
  the reference; here rgb with the depth channel averaged in); scale 15.
- `sds_latent_step` <- `train_step_sd_sds_latents` (`sd.py:438-625`): the
  same inpaint-SDS machinery at guidance scale 2.5 (latent-space gradient).
- `sds_pixel_step`  <- `IF.train_step` (`if_utils.py:88-124`): PIXEL-space SDS
  — the UNet predicts noise directly on the (resized) image, no VAE; the
  gradient lands on pixels.
- `sds_novel_view_step` <- `Zero123.train_step` (`zero123_utils.py:127-220`):
  image-conditioned SDS — conditioning latents are channel-concatenated to the
  noisy latents and a conditioning embedding (CLIP image embed + relative
  camera Δ(polar, azimuth, radius)) replaces the text context.

All reuse `_sds_core`'s schedule/CFG/injection plumbing and are jit-friendly.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from mvip_tpu.guidance.layers import resize_bilinear, resize_nearest
from mvip_tpu.guidance.scheduler import anneal_sqrt
from mvip_tpu.guidance.sds import (
    GuidanceModels,
    SDSConfig,
    _sds_core,
    inject_gradient,
)
from mvip_tpu.guidance.unet import apply_unet


def sds_depth_step(key, gm: GuidanceModels, cfg: SDSConfig, i, depth_map, mask,
                   text_embeds, guidance_scale: float = 25.0) -> jnp.ndarray:
    """SDS on rendered depth, tiled to 3 channels (`sd.py:633-641`, scale `:651`)."""
    d3 = jnp.repeat(depth_map[..., -1:] if depth_map.shape[-1] != 1 else depth_map,
                    3, axis=-1)
    t = anneal_sqrt(i, gm.min_step, gm.max_step, cfg.anneal_span_sqrt)
    grad, latents, mask_lat = _sds_core(key, gm, cfg, d3, mask, text_embeds, t,
                                        guidance_scale)
    return inject_gradient(latents, jax.lax.stop_gradient(grad), mask_lat)


def sds_rgbd_step(key, gm: GuidanceModels, cfg: SDSConfig, i, rgb, depth_map, mask,
                  text_embeds, guidance_scale: float = 15.0,
                  depth_weight: float = 0.5) -> jnp.ndarray:
    """SDS on an RGB-D composite (`sd.py:808-822`, scale `:831`). The 3-channel
    VAE sees rgb blended with the depth signal so both receive gradient."""
    d = depth_map[..., -1:] if depth_map.shape[-1] != 1 else depth_map
    rgbd = (1.0 - depth_weight) * rgb + depth_weight * jnp.repeat(d, 3, axis=-1)
    t = anneal_sqrt(i, gm.min_step, gm.max_step, cfg.anneal_span_sqrt)
    grad, latents, mask_lat = _sds_core(key, gm, cfg, rgbd, mask, text_embeds, t,
                                        guidance_scale)
    return inject_gradient(latents, jax.lax.stop_gradient(grad), mask_lat)


def sds_latent_step(key, gm: GuidanceModels, cfg: SDSConfig, i, image, mask,
                    text_embeds, guidance_scale: float = 2.5) -> jnp.ndarray:
    """Latent-space SDS variant (`sd.py:438-625`; scale `:466`) — identical
    machinery at a low CFG scale."""
    t = anneal_sqrt(i, gm.min_step, gm.max_step, cfg.anneal_span_sqrt)
    grad, latents, mask_lat = _sds_core(key, gm, cfg, image, mask, text_embeds, t,
                                        guidance_scale)
    return inject_gradient(latents, jax.lax.stop_gradient(grad), mask_lat)


def sds_pixel_step(key, gm: GuidanceModels, cfg: SDSConfig, i, image,
                   text_embeds, guidance_scale: float = 20.0,
                   image_size: int = 64) -> jnp.ndarray:
    """Pixel-space SDS, DeepFloyd-IF style (`if_utils.py:88-124`): the UNet
    denoises the image itself; grad = w (eps_hat - eps) injected at the noised
    pixels. Requires a pixel-space UNet (in_channels == image channels)."""
    C = image.shape[-1]
    assert gm.unet_cfg.in_channels == C, "pixel SDS needs a pixel-space UNet"
    img = resize_bilinear(image, image_size, image_size) * 2.0 - 1.0  # IF uses [-1,1]

    t = anneal_sqrt(i, gm.min_step, gm.max_step, cfg.anneal_span_sqrt)
    noise = jax.random.normal(key, img.shape, jnp.float32)
    a_t = gm.alphas_cumprod[t]
    x_t = jnp.sqrt(a_t) * img + jnp.sqrt(1.0 - a_t) * noise

    B = img.shape[0]
    x2 = jnp.concatenate([jax.lax.stop_gradient(x_t)] * 2, 0)
    t2 = jnp.broadcast_to(jnp.atleast_1d(t), (2 * B,))
    eps = apply_unet(gm.unet_params, gm.unet_cfg, x2, t2, text_embeds,
                     compute_dtype=cfg.compute_dtype)
    eps = eps[..., :C]  # IF predicts (eps, variance); keep the eps half
    eps_hat = eps[:B] + guidance_scale * (eps[B:] - eps[:B])

    grad = jnp.nan_to_num((1.0 - a_t) * (eps_hat - noise)) * cfg.grad_scale
    ones = jnp.ones_like(x_t[..., :1])
    return inject_gradient(x_t, jax.lax.stop_gradient(grad), ones)


def sds_novel_view_step(key, gm: GuidanceModels, cfg: SDSConfig, i, image,
                        cond_latents, cond_embeds,
                        guidance_scale: float = 5.0) -> jnp.ndarray:
    """Image-conditioned novel-view SDS, Zero-1-to-3 style
    (`zero123_utils.py:127-220`): conditioning latents (VAE of the reference
    view) are channel-concatenated to the noisy latents; `cond_embeds`
    [2, T, C] carries the CLIP image embedding + relative-camera tokens
    (uncond first). Requires unet.in_channels == 2 * latent_channels."""
    lc = gm.vae_cfg.latent_channels
    assert gm.unet_cfg.in_channels == 2 * lc, "novel-view SDS needs an 8-ch UNet"
    size = cfg.latent_size
    img = resize_bilinear(image, size, size)
    if cfg.normalize_input:
        img = 2.0 * img - 1.0

    from mvip_tpu.guidance import vae as vae_mod

    k_enc, k_noise = jax.random.split(key)
    z0 = vae_mod.encode(gm.vae_params, gm.vae_cfg, img, k_enc)
    t = anneal_sqrt(i, gm.min_step, gm.max_step, cfg.anneal_span_sqrt)
    noise = jax.random.normal(k_noise, z0.shape, jnp.float32)
    a_t = gm.alphas_cumprod[t]
    latents = jnp.sqrt(a_t) * z0 + jnp.sqrt(1.0 - a_t) * noise

    B = latents.shape[0]
    lat2 = jnp.concatenate([jax.lax.stop_gradient(latents)] * 2, 0)
    # CFG on the conditioning: zero latents for the uncond half (zero123 rule)
    cl = jax.lax.stop_gradient(cond_latents)
    cond2 = jnp.concatenate([jnp.zeros_like(cl), cl], 0)
    unet_in = jnp.concatenate([lat2, cond2], -1)
    t2 = jnp.broadcast_to(jnp.atleast_1d(t), (2 * B,))
    eps = apply_unet(gm.unet_params, gm.unet_cfg, unet_in, t2, cond_embeds,
                     compute_dtype=cfg.compute_dtype)
    eps_hat = eps[:B] + guidance_scale * (eps[B:] - eps[:B])

    grad = jnp.nan_to_num((1.0 - a_t) * (eps_hat - noise)) * cfg.grad_scale
    ones = jnp.ones_like(latents[..., :1])
    return inject_gradient(latents, jax.lax.stop_gradient(grad), ones)


def sds_rgb_perpneg_step(key, gm: GuidanceModels, cfg: SDSConfig, i, image, mask,
                         text_embeds_dirs, weights,
                         guidance_scale: float = 7.5) -> jnp.ndarray:
    """Perp-Neg SDS: CFG with K directional prompts aggregated perpendicular to
    the main positive (`perpneg_utils.py:17-48` + the `adjust_text_embeddings`
    machinery, imported-but-uncalled in the reference's active path).

    text_embeds_dirs [1+K, T, C]: [uncond | pos | neg_1..neg_{K-1}];
    weights [K]: aggregation weights (weights[0] must be 1 for the positive).
    """
    from mvip_tpu.guidance.perpneg import weighted_perpendicular_aggregator
    from mvip_tpu.guidance.sds import _prep_image_mask, _encode_latents
    from mvip_tpu.guidance import vae as vae_mod

    K = text_embeds_dirs.shape[0] - 1
    size = cfg.latent_size
    lat_size = size // gm.vae_cfg.downscale
    img, m = _prep_image_mask(image, mask, size, cfg.normalize_input)
    masked_img = img * (m < 0.5).astype(img.dtype)
    k_enc, k_noise = jax.random.split(key)
    z0, masked_z = _encode_latents(k_enc, gm, img, masked_img)
    mask_lat = jax.lax.stop_gradient(resize_nearest(m, lat_size, lat_size))

    t = anneal_sqrt(i, gm.min_step, gm.max_step, cfg.anneal_span_sqrt)
    noise = jax.random.normal(k_noise, z0.shape, jnp.float32)
    a_t = gm.alphas_cumprod[t]
    latents = jnp.sqrt(a_t) * z0 + jnp.sqrt(1.0 - a_t) * noise

    # one batched UNet pass over [uncond | K directional] conditionings
    B = 1 + K
    lat_b = jnp.broadcast_to(jax.lax.stop_gradient(latents), (B, *latents.shape[1:]))
    m_b = jnp.broadcast_to(mask_lat, (B, *mask_lat.shape[1:]))
    mz_b = jnp.broadcast_to(masked_z, (B, *masked_z.shape[1:]))
    unet_in = jnp.concatenate([lat_b, m_b, mz_b], -1)
    t_b = jnp.broadcast_to(jnp.atleast_1d(t), (B,))
    eps = apply_unet(gm.unet_params, gm.unet_cfg, unet_in, t_b, text_embeds_dirs,
                     compute_dtype=cfg.compute_dtype)
    eps_u = eps[:1]
    delta = eps[1:] - eps_u                                 # [K, h, w, 4]
    agg = weighted_perpendicular_aggregator(delta, weights, 1)
    eps_hat = eps_u + guidance_scale * agg

    grad = jnp.nan_to_num((1.0 - a_t) * (eps_hat - noise)) * cfg.grad_scale
    return inject_gradient(latents, jax.lax.stop_gradient(grad), mask_lat)
