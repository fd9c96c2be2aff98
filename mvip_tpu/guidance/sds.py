"""Score Distillation Sampling steps — the MVIP-NeRF core, fully jittable.

Capability parity with the reference's three SDS variants
(`DS_NeRF/guidance/sd_utils.py`):
- `sds_rgb_step`    <- `train_step_sd`        (`:275-429`)
- `sds_normal_step` <- `train_step_sd_normal` (`:120-272`)
- `sds_colla_step`  <- `train_step_colla_sds` (`:432-599`)
- `inject_gradient` <- `SpecifyGradient`      (`:21-37`)

Pipeline per step (mirroring diffusers' inpaint internals the reference drives):
resize image+|mask| to 512^2 -> masked_image = img * (mask < 0.5) -> VAE-encode
image (differentiable! the SDS gradient enters at the latents and flows back
through the encoder into the rendered pixels) and masked image (frozen) ->
latents = sqrt(abar_t)*z0 + sqrt(1-abar_t)*eps -> 9-channel UNet CFG pair ->
grad = (1-abar_t) * (eps_hat - eps) -> inject at latents, masked to the
inpainting region.

TPU-first deviations from the reference (documented, behavior-preserving):
- The CFG pair and (for collaborative SDS) all neighbor views run as ONE batched
  UNet call instead of Python loops (`sd_utils.py:442-597` loops per view).
- Everything is traced: one XLA program per step shape, no host round-trips,
  no debug-PNG writes in the hot path (reference writes PNGs every step, `:416`).
- Input images stay in [0,1] exactly as the reference feeds them (it skips
  diffusers' [-1,1] preprocess — a reference quirk we keep for parity; flip
  `normalize_input=True` for the textbook behavior).

Reference bugs reproduced ONLY behind flags (SURVEY.md §2.5):
- collaborative timestep annealing over the neighbor index instead of the
  training iteration (`anneal_over_neighbors=True`);
- collaborative gradient attached only to the last view (`colla_apply='last'`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mvip_tpu.guidance import vae as vae_mod
from mvip_tpu.guidance.layers import resize_bilinear, resize_nearest
from mvip_tpu.guidance.scheduler import DiffusionSchedule, anneal_linear, anneal_sqrt
from mvip_tpu.guidance.unet import UNetConfig, apply_unet
from mvip_tpu.guidance.vae import VAEConfig


@dataclass(frozen=True)
class SDSConfig:
    latent_size: int = 512          # working resolution (`sd_utils.py:281`)
    guidance_scale: float = 7.5     # CFG weight (config `rgb_guidance_scale`)
    grad_scale: float = 1.0         # `lambda_guidance`
    normalize_input: bool = False   # reference feeds [0,1] straight to the VAE
    anneal_span_sqrt: float = 20000.0
    anneal_span_linear: float = 10000.0
    compute_dtype: Any = jnp.bfloat16  # frozen UNet runs in bf16 on TPU


class GuidanceModels(NamedTuple):
    """Frozen diffusion-model bundle + schedule constants (device-resident)."""

    unet_params: Dict[str, Any]
    vae_params: Dict[str, Any]
    unet_cfg: UNetConfig
    vae_cfg: VAEConfig
    alphas_cumprod: jnp.ndarray     # [T]
    min_step: int
    max_step: int


def make_guidance_models(unet_params, vae_params, unet_cfg, vae_cfg,
                         schedule: Optional[DiffusionSchedule] = None) -> GuidanceModels:
    schedule = schedule or DiffusionSchedule()
    return GuidanceModels(
        unet_params=jax.tree.map(jax.lax.stop_gradient, unet_params),
        vae_params=vae_params,
        unet_cfg=unet_cfg,
        vae_cfg=vae_cfg,
        alphas_cumprod=jnp.asarray(schedule.alphas_cumprod),
        min_step=schedule.min_step,
        max_step=schedule.max_step,
    )


# --- gradient injection (SpecifyGradient parity) --------------------------------


@jax.custom_vjp
def inject_gradient(latents: jnp.ndarray, grad: jnp.ndarray, mask: jnp.ndarray):
    """Forward: dummy scalar 1. Backward: dL/dlatents = grad * g * mask.

    `g` is the incoming cotangent (1.0 when the SDS term enters the total loss
    with weight `sds_loss_weight`, matching the reference where AMP's scale
    played that role, `sd_utils.py:29-37`)."""
    del grad, mask
    return jnp.ones((), latents.dtype)


def _inject_fwd(latents, grad, mask):
    return jnp.ones((), latents.dtype), (grad, mask)


def _inject_bwd(res, g):
    grad, mask = res
    return (grad * g * mask, None, None)


inject_gradient.defvjp(_inject_fwd, _inject_bwd)


# --- shared core ------------------------------------------------------------------


def _prep_image_mask(image, mask, size: int, normalize: bool):
    """[B,H,W,3] + [B,H,W,1] -> resized image/mask at the working resolution."""
    img = resize_bilinear(image, size, size)
    m = resize_bilinear(jnp.abs(mask), size, size)
    if normalize:
        img = 2.0 * img - 1.0
    return img, m


# Input-pixel threshold above which multi-view VAE encodes run per-view
# (see _encode_latents). 512^2 = the real-SD working resolution; tiny-stack
# tests (128^2 inputs) stay on the batched path.
_VAE_CHUNK_MIN_PIXELS = 512 * 512


def _encode_latents(key, gm: GuidanceModels, img, masked_img,
                    compute_dtype=None):
    """VAE-encode image (grad ON) and masked image (grad OFF, UNet input only).

    compute_dtype: frozen-encoder conv precision (bf16 in production, like the
    reference's fp16 pipe). The encoder VJP is the only differentiated
    guidance net and dominates the colla phase at batch 10 x 512^2 when run
    f32 (tools/probe_colla_cost.py)."""
    k1, k2 = jax.random.split(key)
    B = img.shape[0]
    if B > 1 and img.shape[1] * img.shape[2] >= _VAE_CHUNK_MIN_PIXELS:
        # Per-view encode for large multi-view batches (the colla branch at
        # real SD scale): the batch-B 512^2 encoder VJP keeps ~1.3 GB of
        # activation temps live (f32[5,262144,32,4]-class buffers, measured
        # r4 OOM dump) — lax.map + remat bounds that to one view's worth.
        # Stochastic draws use per-view keys, so values differ from the
        # batched path in the sample noise only (same distribution — the
        # same contract as fuse_guidance_renders' regrouped PRNG streams);
        # tiny-stack tests stay on the batched path (<512^2 inputs).
        ks1 = jax.random.split(k1, B)
        ks2 = jax.random.split(k2, B)

        @jax.checkpoint
        def _one(args):
            im, mi, ka, kb = args
            z = vae_mod.encode(gm.vae_params, gm.vae_cfg, im[None], ka,
                               sample=True, compute_dtype=compute_dtype)
            mz = jax.lax.stop_gradient(
                vae_mod.encode(gm.vae_params, gm.vae_cfg, mi[None], kb,
                               sample=True, compute_dtype=compute_dtype)
            )
            return z[0], mz[0]

        z0, masked_z = jax.lax.map(_one, (img, masked_img, ks1, ks2))
        return z0, jax.lax.stop_gradient(masked_z)
    z0 = vae_mod.encode(gm.vae_params, gm.vae_cfg, img, k1, sample=True,
                        compute_dtype=compute_dtype)
    masked_z = jax.lax.stop_gradient(
        vae_mod.encode(gm.vae_params, gm.vae_cfg, masked_img, k2, sample=True,
                       compute_dtype=compute_dtype)
    )
    return z0, masked_z


def _cfg_eps(gm: GuidanceModels, latents, mask_lat, masked_lat, t, text_embeds,
             guidance_scale: float, compute_dtype):
    """One batched 9-ch UNet CFG pass. text_embeds [2B, T, C] = [uncond | cond]."""
    B = latents.shape[0]
    lat2 = jnp.concatenate([latents, latents], 0)
    mask2 = jnp.concatenate([mask_lat, mask_lat], 0)
    mlat2 = jnp.concatenate([masked_lat, masked_lat], 0)
    unet_in = jnp.concatenate([lat2, mask2, mlat2], -1)
    t2 = jnp.concatenate([jnp.broadcast_to(jnp.atleast_1d(t), (B,))] * 2)
    eps = apply_unet(gm.unet_params, gm.unet_cfg, unet_in, t2, text_embeds,
                     compute_dtype=compute_dtype)
    eps_u, eps_c = eps[:B], eps[B:]
    return eps_u + guidance_scale * (eps_c - eps_u)


def _sds_core(key, gm: GuidanceModels, cfg: SDSConfig, image, mask, text_embeds,
              t, guidance_scale: float):
    """Shared SDS machinery for a [B,...] batch sharing one text embedding pair.

    Returns (grad, latents, mask_lat); the caller injects the gradient.
    """
    B = image.shape[0]
    size = cfg.latent_size
    lat_size = size // gm.vae_cfg.downscale

    img, m = _prep_image_mask(image, mask, size, cfg.normalize_input)
    masked_img = img * (m < 0.5).astype(img.dtype)

    k_enc, k_noise = jax.random.split(key)
    z0, masked_z = _encode_latents(k_enc, gm, img, masked_img,
                                   compute_dtype=cfg.compute_dtype)

    mask_lat = jax.lax.stop_gradient(resize_nearest(m, lat_size, lat_size))

    noise = jax.random.normal(k_noise, z0.shape, jnp.float32)
    a_t = gm.alphas_cumprod[t]
    while a_t.ndim < z0.ndim:          # t may be scalar or per-view [B]
        a_t = a_t[..., None]
    latents = jnp.sqrt(a_t) * z0 + jnp.sqrt(1.0 - a_t) * noise

    eps_hat = _cfg_eps(
        gm, jax.lax.stop_gradient(latents), mask_lat, masked_z, t, text_embeds,
        guidance_scale, cfg.compute_dtype,
    )
    w = 1.0 - gm.alphas_cumprod[t]
    while w.ndim < z0.ndim:
        w = w[..., None]
    grad = jnp.nan_to_num(w * (eps_hat - noise)) * cfg.grad_scale
    return grad, latents, mask_lat


# --- the three SDS train steps --------------------------------------------------


def sds_rgb_step(key, gm: GuidanceModels, cfg: SDSConfig, i, image, mask,
                 text_embeds, return_aux: bool = False):
    """SDS on the composited RGB render (`train_step_sd`, `sd_utils.py:275-429`).

    image [1,H,W,3] in [0,1] (masked region = NeRF render, rest = GT);
    mask [1,H,W,1]; text_embeds [2,T,C] = [uncond | cond]; i = training iter.
    """
    t = anneal_sqrt(i, gm.min_step, gm.max_step, cfg.anneal_span_sqrt)
    grad, latents, mask_lat = _sds_core(key, gm, cfg, image, mask, text_embeds, t,
                                        cfg.guidance_scale)
    loss = inject_gradient(latents, jax.lax.stop_gradient(grad), mask_lat)
    if return_aux:
        return loss, jnp.mean(jnp.abs(grad))
    return loss


def sds_normal_step(key, gm: GuidanceModels, cfg: SDSConfig, i, normal_map, mask,
                    text_embeds, normal_start: int = 0,
                    guidance_scale: Optional[float] = None,
                    return_aux: bool = False):
    """SDS on the rendered normal map (`train_step_sd_normal`, `sd_utils.py:120-272`).

    Timestep anneal offset by `normal_start` (`:208`); separate prompt/scale
    (config `text_normal`, `normal_guidance_scale`)."""
    t = anneal_sqrt(jnp.asarray(i) - normal_start, gm.min_step, gm.max_step,
                    cfg.anneal_span_sqrt)
    grad, latents, mask_lat = _sds_core(
        key, gm, cfg, normal_map, mask, text_embeds, t,
        guidance_scale if guidance_scale is not None else cfg.guidance_scale,
    )
    loss = inject_gradient(latents, jax.lax.stop_gradient(grad), mask_lat)
    if return_aux:
        return loss, jnp.mean(jnp.abs(grad))
    return loss


def sds_colla_step(key, gm: GuidanceModels, cfg: SDSConfig, i, images, masks,
                   text_embeds, anneal_over_neighbors: bool = False,
                   colla_apply: str = "all", return_aux: bool = False):
    """Collaborative multi-view SDS (`train_step_colla_sds`, `sd_utils.py:432-599`).

    images [N,H,W,3] (neighboring-view renders), masks [N,H,W,1],
    text_embeds [2,T,C] (shared prompt). All N views run in ONE batched UNet CFG
    call; per-view gradients are SUMMED into a consensus gradient (the
    accumulation at `sd_utils.py:575`).

    colla_apply: 'all' (consensus grad drives every view — the intended
    collaboration) or 'last' (reference parity: grad attaches only to the last
    view's latents, `:597`).
    anneal_over_neighbors: False -> t anneals over the training iteration
    (linear, `i/10000`); True reproduces the reference's neighbor-index shadowing
    bug (`:442,527`).
    """
    N = images.shape[0]
    if anneal_over_neighbors:
        t = anneal_linear(jnp.arange(N), gm.min_step, gm.max_step,
                          cfg.anneal_span_linear)          # [N]
    else:
        t = anneal_linear(i, gm.min_step, gm.max_step, cfg.anneal_span_linear)

    # broadcast the CFG text pair across views: [2N, T, C]
    uncond, cond = text_embeds[0], text_embeds[1]
    te = jnp.concatenate(
        [jnp.broadcast_to(uncond, (N, *uncond.shape)),
         jnp.broadcast_to(cond, (N, *cond.shape))], 0
    )

    grad, latents, m_lat = _sds_core(key, gm, cfg, images, masks, te, t,
                                     cfg.guidance_scale)
    # consensus: sum per-view grads (reference accumulates into one buffer, `:575`)
    g_sum = jnp.sum(grad, axis=0, keepdims=True)
    if colla_apply == "last":
        loss = inject_gradient(
            latents[-1:], jax.lax.stop_gradient(g_sum), m_lat[-1:]
        )
    else:
        loss = inject_gradient(
            latents, jax.lax.stop_gradient(jnp.broadcast_to(g_sum, grad.shape)),
            m_lat,
        )
    if return_aux:
        return loss, jnp.mean(jnp.abs(g_sum))
    return loss
