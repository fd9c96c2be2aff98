"""CLIP text + vision transformers — pure JAX, MXU-shaped.

Two consumers, matching the reference:
- the SD text encoder (`DS_NeRF/guidance/sd_utils.py:110-117` —
  `text_encoder(input_ids)[0]`, i.e. the last hidden state, padded to 77 tokens),
- the optional CLIP guidance (`DS_NeRF/guidance/clip_utils.py:21-34` — pooled,
  projected, L2-normalized text/image embeddings for a cosine-similarity loss).

Both towers share one transformer body; the text tower is causal with
quick-GELU (CLIP convention), the vision tower patch-embeds NHWC images.
Tokenization: `tokenize()` uses a local HuggingFace tokenizer when vocab files
are present (no network), else callers pass precomputed ids.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvip_tpu.guidance.layers import (
    attn_init,
    attention,
    layer_norm,
    linear,
    linear_init,
    norm_init,
    quick_gelu,
)


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp: int = 3072
    max_len: int = 77
    eos_token_id: int = 49407
    projection_dim: int = 0   # 0 = no projection head (SD text encoder)


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch: int = 16           # ViT-B/16 (`clip_utils.py:14`)
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp: int = 3072
    projection_dim: int = 512


def tiny_text_config() -> CLIPTextConfig:
    return CLIPTextConfig(vocab_size=64, hidden=16, layers=2, heads=2, mlp=32,
                          max_len=8, eos_token_id=63)


def tiny_vision_config() -> CLIPVisionConfig:
    return CLIPVisionConfig(image_size=16, patch=8, hidden=16, layers=2, heads=2,
                            mlp=32, projection_dim=8)


# CLIP image preprocessing constants (`clip_utils.py:18`)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


# --- shared transformer body -------------------------------------------------


def _block_init(key, hidden, heads, mlp, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln1": norm_init(hidden, dtype),
        "attn": attn_init(k1, hidden, heads, hidden // heads, dtype=dtype),
        "ln2": norm_init(hidden, dtype),
        "fc1": linear_init(k2, hidden, mlp, dtype),
        "fc2": linear_init(k3, mlp, hidden, dtype),
    }


def _block(p, x, heads, mask=None):
    x = x + attention(p["attn"], layer_norm(p["ln1"], x), heads=heads, mask=mask)
    h = quick_gelu(linear(p["fc1"], layer_norm(p["ln2"], x)))
    return x + linear(p["fc2"], h)


def _causal_mask(T: int) -> jnp.ndarray:
    return jnp.where(
        jnp.tril(jnp.ones((T, T), jnp.bool_)), 0.0, -jnp.inf
    ).astype(jnp.float32)


# --- text tower ----------------------------------------------------------------


def init_clip_text(key, cfg: CLIPTextConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, cfg.layers + 4))
    p = {
        "token_emb": jax.random.normal(next(keys), (cfg.vocab_size, cfg.hidden), dtype) * 0.02,
        "pos_emb": jax.random.normal(next(keys), (cfg.max_len, cfg.hidden), dtype) * 0.01,
        "blocks": [_block_init(next(keys), cfg.hidden, cfg.heads, cfg.mlp, dtype)
                   for _ in range(cfg.layers)],
        "ln_final": norm_init(cfg.hidden, dtype),
    }
    if cfg.projection_dim:
        p["proj"] = jax.random.normal(
            next(keys), (cfg.hidden, cfg.projection_dim), dtype
        ) / math.sqrt(cfg.hidden)
    return p


def apply_clip_text(params, cfg: CLIPTextConfig, ids: jnp.ndarray) -> jnp.ndarray:
    """ids [B, T] -> last hidden state [B, T, hidden] (what SD cross-attends to)."""
    T = ids.shape[-1]
    x = params["token_emb"][ids] + params["pos_emb"][:T]
    mask = _causal_mask(T)
    for b in params["blocks"]:
        x = _block(b, x, cfg.heads, mask)
    return layer_norm(params["ln_final"], x)


def clip_text_features(params, cfg: CLIPTextConfig, ids: jnp.ndarray) -> jnp.ndarray:
    """Pooled (EOS-token) projected embedding, L2-normalized (`clip_utils.py:21-27`)."""
    h = apply_clip_text(params, cfg, ids)
    eos_pos = jnp.argmax((ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = h[jnp.arange(h.shape[0]), eos_pos]
    if "proj" in params:
        pooled = jnp.dot(pooled, params["proj"], preferred_element_type=jnp.float32)
    return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)


# --- vision tower ----------------------------------------------------------------


def init_clip_vision(key, cfg: CLIPVisionConfig, dtype=jnp.float32) -> Dict[str, Any]:
    n_patches = (cfg.image_size // cfg.patch) ** 2
    keys = iter(jax.random.split(key, cfg.layers + 6))
    return {
        "patch_emb": jax.random.normal(
            next(keys), (cfg.patch, cfg.patch, 3, cfg.hidden), dtype
        ) * 0.02,
        "cls": jax.random.normal(next(keys), (cfg.hidden,), dtype) * 0.02,
        "pos_emb": jax.random.normal(next(keys), (n_patches + 1, cfg.hidden), dtype) * 0.01,
        "ln_pre": norm_init(cfg.hidden, dtype),
        "blocks": [_block_init(next(keys), cfg.hidden, cfg.heads, cfg.mlp, dtype)
                   for _ in range(cfg.layers)],
        "ln_post": norm_init(cfg.hidden, dtype),
        "proj": jax.random.normal(
            next(keys), (cfg.hidden, cfg.projection_dim), dtype
        ) / math.sqrt(cfg.hidden),
    }


def clip_image_features(params, cfg: CLIPVisionConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3] already resized+normalized -> [B, proj] L2-normalized."""
    x = jax.lax.conv_general_dilated(
        images, params["patch_emb"],
        window_strides=(cfg.patch, cfg.patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.hidden)
    cls = jnp.broadcast_to(params["cls"], (B, 1, cfg.hidden))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_emb"]
    x = layer_norm(params["ln_pre"], x)
    for b in params["blocks"]:
        x = _block(b, x, cfg.heads)
    pooled = layer_norm(params["ln_post"], x[:, 0])
    pooled = jnp.dot(pooled, params["proj"], preferred_element_type=jnp.float32)
    return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)


def preprocess_image(images: jnp.ndarray, cfg: CLIPVisionConfig) -> jnp.ndarray:
    """[B, H, W, 3] in [0,1] -> resized 224^2 + CLIP-normalized (`clip_utils.py:16-19`)."""
    x = jax.image.resize(
        images, (images.shape[0], cfg.image_size, cfg.image_size, 3), "bilinear"
    )
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


# --- tokenizer (gated: local files only, zero egress) -----------------------------


def tokenize(prompts, tokenizer_path: Optional[str] = None, max_len: int = 77) -> np.ndarray:
    """Prompt strings -> padded ids [B, max_len] via a LOCAL HF CLIPTokenizer.

    Mirrors `sd_utils.py:114` (padding='max_length'). Raises with guidance when no
    local vocab is available — callers may pass precomputed ids everywhere else.
    """
    if isinstance(prompts, str):
        prompts = [prompts]
    try:
        from transformers import CLIPTokenizer, CLIPTokenizerFast

        for cls in (CLIPTokenizerFast, CLIPTokenizer):
            try:
                tok = cls.from_pretrained(
                    tokenizer_path or "openai/clip-vit-large-patch14",
                    local_files_only=True,
                )
                out = tok(prompts, padding="max_length", max_length=max_len,
                          truncation=True, return_tensors="np")
                return out["input_ids"].astype(np.int32)
            except OSError:
                continue
    except ImportError:
        pass
    raise FileNotFoundError(
        "No local CLIP tokenizer vocab found. Pass tokenizer_path to a local "
        "directory containing vocab.json/merges.txt, or supply precomputed "
        "token ids to the guidance APIs."
    )
