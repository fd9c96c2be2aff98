"""Checkpoint porting: HuggingFace SD/CLIP state dicts <-> mvip_tpu pytrees.

The reference pulls `runwayml/stable-diffusion-inpainting` from the hub at
runtime (`DS_NeRF/guidance/sd_utils.py:69-74`). This environment has zero
egress, so porting is GATED: `load_sd_guidance(dir)` works when a local
checkpoint directory exists (diffusers layout: `unet/`, `vae/`,
`text_encoder/` with `*.safetensors` or `*.bin`), and the name mapping is
validated by a synthetic export->import round trip in the tests.

Transforms (torch -> TPU-native layout):
- conv weights OIHW -> HWIO
- linear weights [out, in] -> [in, out]
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from mvip_tpu.guidance.clip import CLIPTextConfig, CLIPVisionConfig
from mvip_tpu.guidance.unet import UNetConfig
from mvip_tpu.guidance.vae import VAEConfig

# (hf_name_prefix, pytree_path, kind) ; kind in {conv, linear, norm, raw,
# linear_w_t, conv_w_hwio} (the last two map bias-free torch weights onto
# plain-array pytree leaves)
MapEntry = Tuple[str, Tuple, str]


# --- mapping generators -----------------------------------------------------------


def _attn_map(hf: str, path: Tuple) -> List[MapEntry]:
    return [
        (f"{hf}.to_q", path + ("q",), "linear"),
        (f"{hf}.to_k", path + ("k",), "linear"),
        (f"{hf}.to_v", path + ("v",), "linear"),
        (f"{hf}.to_out.0", path + ("o",), "linear"),
    ]


def _transformer_map(hf: str, path: Tuple) -> List[MapEntry]:
    tb = f"{hf}.transformer_blocks.0"
    return (
        [
            (f"{hf}.norm", path + ("norm",), "norm"),
            (f"{hf}.proj_in", path + ("proj_in",), "conv"),
            (f"{tb}.norm1", path + ("ln1",), "norm"),
            (f"{tb}.norm2", path + ("ln2",), "norm"),
            (f"{tb}.norm3", path + ("ln3",), "norm"),
            (f"{tb}.ff.net.0.proj", path + ("ff1",), "linear"),
            (f"{tb}.ff.net.2", path + ("ff2",), "linear"),
            (f"{hf}.proj_out", path + ("proj_out",), "conv"),
        ]
        + _attn_map(f"{tb}.attn1", path + ("attn1",))
        + _attn_map(f"{tb}.attn2", path + ("attn2",))
    )


def _resnet_map(hf: str, path: Tuple, temb: bool, shortcut: bool) -> List[MapEntry]:
    out = [
        (f"{hf}.norm1", path + ("norm1",), "norm"),
        (f"{hf}.conv1", path + ("conv1",), "conv"),
        (f"{hf}.norm2", path + ("norm2",), "norm"),
        (f"{hf}.conv2", path + ("conv2",), "conv"),
    ]
    if temb:
        out.append((f"{hf}.time_emb_proj", path + ("temb",), "linear"))
    if shortcut:
        out.append((f"{hf}.conv_shortcut", path + ("shortcut",), "conv"))
    return out


def unet_mapping(cfg: UNetConfig) -> List[MapEntry]:
    ch = cfg.block_channels
    m: List[MapEntry] = [
        ("conv_in", ("conv_in",), "conv"),
        ("time_embedding.linear_1", ("time1",), "linear"),
        ("time_embedding.linear_2", ("time2",), "linear"),
        ("conv_norm_out", ("norm_out",), "norm"),
        ("conv_out", ("conv_out",), "conv"),
    ]
    skip_ch = [ch[0]]
    c_prev = ch[0]
    for i, c in enumerate(ch):
        for j in range(cfg.layers_per_block):
            c_in = c_prev if j == 0 else c
            m += _resnet_map(f"down_blocks.{i}.resnets.{j}",
                             ("down", i, "resnets", j), True, c_in != c)
            if cfg.cross_attn[i]:
                m += _transformer_map(f"down_blocks.{i}.attentions.{j}",
                                      ("down", i, "attns", j))
            skip_ch.append(c)
        if i < len(ch) - 1:
            m.append((f"down_blocks.{i}.downsamplers.0.conv", ("down", i, "down"), "conv"))
            skip_ch.append(c)
        c_prev = c

    m += _resnet_map("mid_block.resnets.0", ("mid", "res1"), True, False)
    m += _transformer_map("mid_block.attentions.0", ("mid", "attn"))
    m += _resnet_map("mid_block.resnets.1", ("mid", "res2"), True, False)

    c_prev = ch[-1]
    for i, c in enumerate(reversed(ch)):
        ridx = len(ch) - 1 - i
        for j in range(cfg.layers_per_block + 1):
            c_skip = skip_ch.pop()
            c_in = (c_prev if j == 0 else c) + c_skip
            m += _resnet_map(f"up_blocks.{i}.resnets.{j}",
                             ("up", i, "resnets", j), True, c_in != c)
            if cfg.cross_attn[ridx]:
                m += _transformer_map(f"up_blocks.{i}.attentions.{j}",
                                      ("up", i, "attns", j))
        if i < len(ch) - 1:
            m.append((f"up_blocks.{i}.upsamplers.0.conv", ("up", i, "up"), "conv"))
        c_prev = c
    return m


def vae_mapping(cfg: VAEConfig) -> List[MapEntry]:
    def vae_attn(hf: str, path: Tuple) -> List[MapEntry]:
        return [(f"{hf}.group_norm", path + ("norm",), "norm")] + _attn_map(
            hf, path + ("attn",)
        )

    ch = cfg.block_channels
    m: List[MapEntry] = [
        ("encoder.conv_in", ("encoder", "conv_in"), "conv"),
        ("encoder.conv_norm_out", ("encoder", "norm_out"), "norm"),
        ("encoder.conv_out", ("encoder", "conv_out"), "conv"),
        ("quant_conv", ("quant_conv",), "conv"),
        ("post_quant_conv", ("post_quant_conv",), "conv"),
        ("decoder.conv_in", ("decoder", "conv_in"), "conv"),
        ("decoder.conv_norm_out", ("decoder", "norm_out"), "norm"),
        ("decoder.conv_out", ("decoder", "conv_out"), "conv"),
    ]
    c_prev = ch[0]
    for i, c in enumerate(ch):
        for j in range(cfg.layers_per_block):
            c_in = c_prev if j == 0 else c
            m += _resnet_map(f"encoder.down_blocks.{i}.resnets.{j}",
                             ("encoder", "down_blocks", i, "resnets", j), False, c_in != c)
        if i < len(ch) - 1:
            m.append((f"encoder.down_blocks.{i}.downsamplers.0.conv",
                      ("encoder", "down_blocks", i, "down"), "conv"))
        c_prev = c
    for side in ("encoder", "decoder"):
        m += _resnet_map(f"{side}.mid_block.resnets.0", (side, "mid", "res1"), False, False)
        m += vae_attn(f"{side}.mid_block.attentions.0", (side, "mid", "attn"))
        m += _resnet_map(f"{side}.mid_block.resnets.1", (side, "mid", "res2"), False, False)
    c_prev = ch[-1]
    for i, c in enumerate(reversed(ch)):
        for j in range(cfg.layers_per_block + 1):
            c_in = c_prev if j == 0 else c
            m += _resnet_map(f"decoder.up_blocks.{i}.resnets.{j}",
                             ("decoder", "up_blocks", i, "resnets", j), False, c_in != c)
        if i < len(ch) - 1:
            m.append((f"decoder.up_blocks.{i}.upsamplers.0.conv",
                      ("decoder", "up_blocks", i, "up"), "conv"))
        c_prev = c
    return m


def clip_text_mapping(cfg: CLIPTextConfig) -> List[MapEntry]:
    m: List[MapEntry] = [
        ("text_model.embeddings.token_embedding", ("token_emb",), "raw"),
        ("text_model.embeddings.position_embedding", ("pos_emb",), "raw"),
        ("text_model.final_layer_norm", ("ln_final",), "norm"),
    ]
    for i in range(cfg.layers):
        lyr = f"text_model.encoder.layers.{i}"
        path = ("blocks", i)
        m += [
            (f"{lyr}.layer_norm1", path + ("ln1",), "norm"),
            (f"{lyr}.self_attn.q_proj", path + ("attn", "q"), "linear"),
            (f"{lyr}.self_attn.k_proj", path + ("attn", "k"), "linear"),
            (f"{lyr}.self_attn.v_proj", path + ("attn", "v"), "linear"),
            (f"{lyr}.self_attn.out_proj", path + ("attn", "o"), "linear"),
            (f"{lyr}.layer_norm2", path + ("ln2",), "norm"),
            (f"{lyr}.mlp.fc1", path + ("fc1",), "linear"),
            (f"{lyr}.mlp.fc2", path + ("fc2",), "linear"),
        ]
    if cfg.projection_dim:
        # nn.Linear(hidden, proj, bias=False): weight [proj, hidden] -> ours
        # [hidden, proj] (`clip_utils.py:21-27` consumes the projected embeds)
        m.append(("text_projection", ("proj",), "linear_w_t"))
    return m


def clip_vision_mapping(cfg: CLIPVisionConfig) -> List[MapEntry]:
    """transformers `CLIPVisionModelWithProjection` names -> our vision pytree
    (the reference's image tower: ViT-B/16, `DS_NeRF/guidance/clip_utils.py:14`).
    Note HF's misspelled `pre_layrnorm` is the real checkpoint key."""
    m: List[MapEntry] = [
        ("vision_model.embeddings.class_embedding", ("cls",), "raw"),
        ("vision_model.embeddings.patch_embedding", ("patch_emb",), "conv_w_hwio"),
        ("vision_model.embeddings.position_embedding", ("pos_emb",), "raw"),
        ("vision_model.pre_layrnorm", ("ln_pre",), "norm"),
        ("vision_model.post_layernorm", ("ln_post",), "norm"),
        ("visual_projection", ("proj",), "linear_w_t"),
    ]
    for i in range(cfg.layers):
        lyr = f"vision_model.encoder.layers.{i}"
        path = ("blocks", i)
        m += [
            (f"{lyr}.layer_norm1", path + ("ln1",), "norm"),
            (f"{lyr}.self_attn.q_proj", path + ("attn", "q"), "linear"),
            (f"{lyr}.self_attn.k_proj", path + ("attn", "k"), "linear"),
            (f"{lyr}.self_attn.v_proj", path + ("attn", "v"), "linear"),
            (f"{lyr}.self_attn.out_proj", path + ("attn", "o"), "linear"),
            (f"{lyr}.layer_norm2", path + ("ln2",), "norm"),
            (f"{lyr}.mlp.fc1", path + ("fc1",), "linear"),
            (f"{lyr}.mlp.fc2", path + ("fc2",), "linear"),
        ]
    return m


# --- pytree plumbing ----------------------------------------------------------------


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


def _import_entry(params, sd: Dict[str, np.ndarray], hf: str, path: Tuple, kind: str):
    if kind == "raw":
        w = sd.get(f"{hf}.weight", sd.get(hf))
        _set(params, path, np.asarray(w))
        return
    node = _get(params, path)
    if kind == "conv":
        node["w"] = np.transpose(np.asarray(sd[f"{hf}.weight"]), (2, 3, 1, 0))
        node["b"] = np.asarray(sd[f"{hf}.bias"])
    elif kind == "linear":
        node["w"] = np.transpose(np.asarray(sd[f"{hf}.weight"]))
        # diffusers' UNet attention to_q/to_k/to_v are bias=False; our linear
        # always carries a bias term — zero it so the math matches exactly
        b = sd.get(f"{hf}.bias")
        node["b"] = (np.asarray(b) if b is not None
                     else np.zeros_like(np.asarray(node["b"])))
    elif kind == "norm":
        node["scale"] = np.asarray(sd[f"{hf}.weight"])
        node["bias"] = np.asarray(sd[f"{hf}.bias"])
    else:
        raise ValueError(kind)


def _import_array_entry(params, sd, hf: str, path: Tuple, kind: str) -> bool:
    """Kinds whose pytree leaf is a plain array (no {w,b} node): transposed
    bias-free linear weights and HWIO conv weights. Returns False for kinds
    `_import_entry` handles."""
    if kind == "linear_w_t":       # nn.Linear(bias=False): [out,in] -> [in,out]
        _set(params, path, np.transpose(np.asarray(sd[f"{hf}.weight"])))
    elif kind == "conv_w_hwio":    # Conv2d(bias=False): OIHW -> HWIO
        _set(params, path, np.transpose(np.asarray(sd[f"{hf}.weight"]), (2, 3, 1, 0)))
    else:
        return False
    return True


def _export_entry(params, out: Dict[str, np.ndarray], hf: str, path: Tuple, kind: str):
    node = _get(params, path)
    if kind == "raw":
        out[f"{hf}.weight"] = np.asarray(node)
    elif kind == "conv":
        out[f"{hf}.weight"] = np.transpose(np.asarray(node["w"]), (3, 2, 0, 1))
        out[f"{hf}.bias"] = np.asarray(node["b"])
    elif kind == "linear":
        out[f"{hf}.weight"] = np.transpose(np.asarray(node["w"]))
        out[f"{hf}.bias"] = np.asarray(node["b"])
    elif kind == "norm":
        out[f"{hf}.weight"] = np.asarray(node["scale"])
        out[f"{hf}.bias"] = np.asarray(node["bias"])
    elif kind == "linear_w_t":
        out[f"{hf}.weight"] = np.transpose(np.asarray(node))
    elif kind == "conv_w_hwio":
        out[f"{hf}.weight"] = np.transpose(np.asarray(node), (3, 2, 0, 1))


def import_state_dict(params, sd: Dict[str, np.ndarray], mapping: List[MapEntry]):
    """In-place: fill `params` (from the matching init_*) with HF tensors."""
    for hf, path, kind in mapping:
        if not _import_array_entry(params, sd, hf, path, kind):
            _import_entry(params, sd, hf, path, kind)
    return params


def export_state_dict(params, mapping: List[MapEntry]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for hf, path, kind in mapping:
        _export_entry(params, out, hf, path, kind)
    return out


# --- file IO (gated) -------------------------------------------------------------------


def _load_checkpoint_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a diffusers component dir (*.safetensors or *.bin)."""
    tensors: Dict[str, np.ndarray] = {}
    for fname in sorted(os.listdir(path)):
        full = os.path.join(path, fname)
        if fname.endswith(".safetensors"):
            from safetensors import safe_open  # available only if installed

            with safe_open(full, framework="np") as f:
                for k in f.keys():
                    tensors[k] = f.get_tensor(k)
        elif fname.endswith(".bin") or fname.endswith(".pt"):
            import torch

            sd = torch.load(full, map_location="cpu", weights_only=True)
            for k, v in sd.items():
                tensors[k] = v.float().numpy()
    if not tensors:
        raise FileNotFoundError(f"no .safetensors/.bin weights under {path}")
    return tensors


def sd15_inpaint_configs() -> Tuple[UNetConfig, VAEConfig, CLIPTextConfig]:
    """Full-size configs matching `runwayml/stable-diffusion-inpainting`."""
    return UNetConfig(), VAEConfig(), CLIPTextConfig()


def load_sd_guidance(root: str, dtype=np.float32):
    """Port a local diffusers checkpoint tree into mvip_tpu pytrees.

    root/ must contain unet/, vae/, text_encoder/ with weight files. Returns
    (unet_params, vae_params, text_params, (unet_cfg, vae_cfg, text_cfg)).
    """
    import jax

    from mvip_tpu.guidance.clip import init_clip_text
    from mvip_tpu.guidance.unet import init_unet
    from mvip_tpu.guidance.vae import init_vae

    unet_cfg, vae_cfg, text_cfg = sd15_inpaint_configs()
    key = jax.random.PRNGKey(0)
    unet_p = jax.tree.map(np.asarray, init_unet(key, unet_cfg))
    vae_p = jax.tree.map(np.asarray, init_vae(key, vae_cfg))
    text_p = jax.tree.map(np.asarray, init_clip_text(key, text_cfg))

    import_state_dict(unet_p, _load_checkpoint_dir(os.path.join(root, "unet")),
                      unet_mapping(unet_cfg))
    import_state_dict(vae_p, _load_checkpoint_dir(os.path.join(root, "vae")),
                      vae_mapping(vae_cfg))
    import_state_dict(text_p, _load_checkpoint_dir(os.path.join(root, "text_encoder")),
                      clip_text_mapping(text_cfg))
    cast = lambda t: jax.tree.map(lambda a: np.asarray(a, dtype), t)
    return cast(unet_p), cast(vae_p), cast(text_p), (unet_cfg, vae_cfg, text_cfg)


def load_clip_guidance(root: str, dtype=np.float32):
    """Port a local transformers CLIP checkpoint dir (ViT-B/16 dual tower,
    the reference's `clip` guidance backend — `DS_NeRF/guidance/clip_utils.py:14`)
    into a ready `CLIPGuidance`. `root` holds the full CLIPModel weights
    (`text_model.*` + `vision_model.*` + both projections)."""
    import jax

    from mvip_tpu.guidance.clip import init_clip_text, init_clip_vision
    from mvip_tpu.guidance.clip_guidance import CLIPGuidance

    text_cfg = CLIPTextConfig(hidden=512, layers=12, heads=8, mlp=2048,
                              projection_dim=512)
    vision_cfg = CLIPVisionConfig()   # ViT-B/16 defaults
    key = jax.random.PRNGKey(0)
    text_p = jax.tree.map(np.asarray, init_clip_text(key, text_cfg))
    vision_p = jax.tree.map(np.asarray, init_clip_vision(key, vision_cfg))
    sd = _load_checkpoint_dir(root)
    import_state_dict(text_p, sd, clip_text_mapping(text_cfg))
    import_state_dict(vision_p, sd, clip_vision_mapping(vision_cfg))
    cast = lambda t: jax.tree.map(lambda a: np.asarray(a, dtype), t)
    return CLIPGuidance(cast(text_p), cast(vision_p), text_cfg, vision_cfg)
