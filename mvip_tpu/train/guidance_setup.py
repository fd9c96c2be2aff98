"""Build the guidance bundle for the trainer from a Config.

Mirrors the reference's guidance construction (`DS_NeRF/run.py:775-789`:
`StableDiffusion(device, ...)` + `Pretrain_Model`), adapted to a zero-egress
environment: weights come from a LOCAL diffusers checkpoint dir
(`cfg.sd_weights`) via `mvip_tpu.guidance.weights.load_sd_guidance`; without
one, `sd_size='tiny'` builds a random-init tiny stack so the full training
pipeline can be exercised end-to-end (plumbing-correct, semantically untrained).
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from mvip_tpu.config import Config
from mvip_tpu.guidance.clip import apply_clip_text, tokenize
from mvip_tpu.guidance.scheduler import DiffusionSchedule
from mvip_tpu.guidance.sds import SDSConfig, make_guidance_models
from mvip_tpu.guidance.unet import init_unet, tiny_unet_config
from mvip_tpu.guidance.vae import init_vae, tiny_vae_config
from mvip_tpu.train.mvip_step import MVIPConfig


def needs_guidance(cfg: Config) -> bool:
    return bool(
        cfg.sds_loss
        or cfg.is_rgb_guidance
        or cfg.is_normal_guidance
        or cfg.is_colla_guidance
    )


def _text_embed_from_prompt(prompt: str, T: int, C: int) -> jnp.ndarray:
    """Deterministic stand-in embedding for tiny/debug guidance: hash the prompt
    into a PRNG seed so distinct prompts get distinct (stable) embeddings."""
    seed = int.from_bytes(hashlib.sha256((prompt or "").encode()).digest()[:4], "little")
    return jax.random.normal(jax.random.PRNGKey(seed), (1, T, C))


def build_guidance(cfg: Config):
    """Returns (gm, mvip_cfg, sds_cfgs(rgb,normal,colla), text_pair_rgb, text_pair_normal)."""
    compute_dtype = jnp.bfloat16 if cfg.fp16 else jnp.float32

    if cfg.sd_weights:
        from mvip_tpu.guidance.weights import load_sd_guidance

        unet_p, vae_p, text_p, (ucfg, vcfg, tcfg) = load_sd_guidance(cfg.sd_weights)
        gm = make_guidance_models(unet_p, vae_p, ucfg, vcfg, DiffusionSchedule())
        import os as _os

        # diffusers snapshots keep the vocab under tokenizer/
        tok_dir = _os.path.join(cfg.sd_weights, "tokenizer")
        tok_path = tok_dir if _os.path.isdir(tok_dir) else cfg.sd_weights
        ids_c = jnp.asarray(tokenize([cfg.text or ""], tok_path))
        ids_u = jnp.asarray(tokenize([cfg.negative or ""], tok_path))
        ids_n = jnp.asarray(tokenize([cfg.text_normal or cfg.text or ""], tok_path))
        cond = apply_clip_text(text_p, tcfg, ids_c)
        uncond = apply_clip_text(text_p, tcfg, ids_u)
        cond_n = apply_clip_text(text_p, tcfg, ids_n)
        latent_size = 512
    else:
        # random-init stack: exercises the full pipeline without weights.
        # sd_size='real' builds the full SD-1.5 inpaint architecture
        # (859.6M UNet / 83.7M VAE at 512px — `sd15_inpaint_configs`) so the
        # production-scale training step can be memory/throughput-proven
        # even in a zero-egress image; 'tiny' keeps the unit-test stack.
        key = jax.random.PRNGKey(cfg.seed + 7)
        if cfg.sd_size == "real":
            from mvip_tpu.guidance.unet import UNetConfig
            from mvip_tpu.guidance.vae import VAEConfig

            ucfg, vcfg = UNetConfig(), VAEConfig()
            T = 77  # CLIP text length at production scale
            latent_size = 512
        elif cfg.sd_size == "tiny":
            ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
            T = 8
            latent_size = 64
        else:
            raise ValueError(f"unknown sd_size {cfg.sd_size!r} (tiny|real)")
        gm = make_guidance_models(
            init_unet(key, ucfg), init_vae(jax.random.fold_in(key, 1), vcfg),
            ucfg, vcfg, DiffusionSchedule(),
        )
        C = ucfg.cross_attention_dim
        cond = _text_embed_from_prompt(cfg.text or "", T, C)
        uncond = _text_embed_from_prompt(cfg.negative or "", T, C)
        cond_n = _text_embed_from_prompt(cfg.text_normal or cfg.text or "", T, C)

    base = SDSConfig(latent_size=latent_size, compute_dtype=compute_dtype,
                     grad_scale=cfg.lambda_guidance)
    import dataclasses

    sds_rgb = dataclasses.replace(base, guidance_scale=cfg.rgb_guidance_scale)
    sds_nrm = dataclasses.replace(base, guidance_scale=cfg.normal_guidance_scale)
    sds_col = dataclasses.replace(base, guidance_scale=cfg.colla_guidance_scale)

    mcfg = MVIPConfig(
        sds_loss_weight=cfg.sds_loss_weight,
        is_rgb_guidance=cfg.is_rgb_guidance,
        is_normal_guidance=cfg.is_normal_guidance,
        normal_start=cfg.normal_start,
        normalmap_render_factor=cfg.normalmap_render_factor,
        is_colla_guidance=cfg.is_colla_guidance,
        render_chunk=min(cfg.chunk, 8192),
        sds_render_factor=max(int(cfg.sds_render_factor), 1),
        fuse_guidance_renders=bool(cfg.fuse_guidance_renders),
        occ_keep_guidance=float(cfg.occ_keep_guidance),
    )
    pair_rgb = jnp.concatenate([uncond, cond], 0)
    pair_nrm = jnp.concatenate([uncond, cond_n], 0)
    return gm, mcfg, (sds_rgb, sds_nrm, sds_col), pair_rgb, pair_nrm
