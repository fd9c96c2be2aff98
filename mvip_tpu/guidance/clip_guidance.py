"""CLIP image-text similarity guidance (optional 'clip' guidance backend).

Capability parity with `DS_NeRF/guidance/clip_utils.py:9-53`: ViT-B/16 text +
image embeddings, cosine-similarity loss on the rendered image. Differentiable
end-to-end in JAX (the reference relies on torch autograd through the frozen
CLIP; here the vision tower is pure JAX so `jax.grad` flows through it).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mvip_tpu.guidance.clip import (
    CLIPTextConfig,
    CLIPVisionConfig,
    clip_image_features,
    clip_text_features,
    preprocess_image,
)


class CLIPGuidance(NamedTuple):
    text_params: Dict[str, Any]
    vision_params: Dict[str, Any]
    text_cfg: CLIPTextConfig
    vision_cfg: CLIPVisionConfig


def get_text_embeds(g: CLIPGuidance, ids: jnp.ndarray) -> jnp.ndarray:
    """Tokenized prompt -> normalized text features (`clip_utils.py:21-27`)."""
    return clip_text_features(g.text_params, g.text_cfg, ids)


def get_img_embeds(g: CLIPGuidance, images: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,3] in [0,1] -> normalized image features (`clip_utils.py:29-34`)."""
    x = preprocess_image(images, g.vision_cfg)
    return clip_image_features(g.vision_params, g.vision_cfg, x)


def clip_loss(g: CLIPGuidance, text_z: jnp.ndarray, pred_rgb: jnp.ndarray,
              image_z: Optional[jnp.ndarray] = None,
              grad_scale: float = 10.0) -> jnp.ndarray:
    """-(cosine similarity) * grad_scale (`clip_utils.py:37-53`).

    The frozen CLIP weights are stop-gradiented; grads flow only into pred_rgb.
    """
    frozen = CLIPGuidance(
        jax.tree.map(jax.lax.stop_gradient, g.text_params),
        jax.tree.map(jax.lax.stop_gradient, g.vision_params),
        g.text_cfg, g.vision_cfg,
    )
    pred_z = get_img_embeds(frozen, pred_rgb)
    loss = -jnp.mean(jnp.sum(pred_z * jax.lax.stop_gradient(text_z), -1) * grad_scale)
    # image-image similarity exists in the reference but is commented out (`:47-48`)
    del image_z
    return loss
