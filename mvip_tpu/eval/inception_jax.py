"""Native JAX InceptionV3 pooled-feature extractor for FID.

The reference scores inpainting with pyiqa's FID (`DS_NeRF/evaluation.py:54`),
which is pooled-InceptionV3 features + the Frechet formula
(`eval/metrics.py frechet_distance`). This image has neither torchvision nor
network egress for pretrained weights, so — exactly like `eval/lpips_jax.py` —
this module implements the FULL published extractor natively (NHWC, jnp) and
leaves only the weights file to be supplied:

    `load_inception_weights(path)` ports a torch state dict the moment one
    lands on disk. Both weight sources in circulation use torchvision's
    module names and are importable unchanged:
      * torchvision `inception_v3` checkpoints (set `transform_input=True`,
        `fid_pools=False`), and
      * pytorch-fid's `pt_inception-2015-12-05` TF-ported checkpoint — the
        de-facto FID standard (default config: `fid_pools=True`).

`fid_pools` captures the two published pooling semantics: torchvision's
InceptionA/C/E pool branches use avg_pool(3, 1, pad=1) with
count_include_pad=True, while pytorch-fid's FIDInceptionA/C/E use
count_include_pad=False and FIDInceptionE_2 (Mixed_7c) swaps the branch to a
MAX pool. Everything else (the block wiring below, BN eps=1e-3, bias-free
convs) is identical between the two.

The computation is validated against a hand-built torch replica of the
published wiring at reduced input size in tests/test_torch_parity_fullgraph.py
(the scheme that validates the UNet/VAE/CLIP/LPIPS graphs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # torchvision BasicConv2d(eps=0.001)


@dataclass(frozen=True)
class InceptionConfig:
    # pytorch-fid pool semantics (the FID-standard weights) vs torchvision's
    fid_pools: bool = True
    # torchvision pretrained checkpoints bake TF's input scaling into the
    # graph (inception.py `_transform_input`); pytorch-fid's do not
    transform_input: bool = False


# ---------------------------------------------------------------------------
# primitives


def _bconv_init(key, kh: int, kw: int, c_in: int, c_out: int) -> Dict[str, Any]:
    """BasicConv2d = bias-free conv + BN(eps=1e-3) + relu; weights HWIO."""
    w = jax.random.normal(key, (kh, kw, c_in, c_out), jnp.float32)
    # He/fan-in init: variance-preserving through the conv+relu stack. The
    # earlier 0.1/sqrt(fan_in) gain collapsed activations to ~1e-20 over the
    # network's depth, making every random-init feature vector constant — a
    # synthesized weights-day tree then measured FID 0.0 between ANY two
    # image sets (r5 finding; real imported weights were never affected).
    w = w * np.sqrt(2.0 / (kh * kw * c_in))
    return {
        "w": w,
        "scale": jnp.ones((c_out,), jnp.float32),
        "bias": jnp.zeros((c_out,), jnp.float32),
        "mean": jnp.zeros((c_out,), jnp.float32),
        "var": jnp.ones((c_out,), jnp.float32),
    }


def _bconv(p, x, stride: int = 1, pad: Tuple[int, int] = (0, 0)):
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    inv = jax.lax.rsqrt(p["var"] + BN_EPS)
    y = (y - p["mean"]) * (inv * p["scale"]) + p["bias"]
    return jax.nn.relu(y).astype(x.dtype)


def _maxpool3(x, stride: int, pad: int = 0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 3, 3, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _avgpool3s1p1(x, count_include_pad: bool):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    if count_include_pad:
        return s / 9.0
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, ..., None]
    n = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return s / n


def _pool_branch(x, cfg: InceptionConfig, block: str):
    """The A/C/E in-block pool: torchvision avg(include_pad) vs pytorch-fid
    avg(exclude_pad), except FIDInceptionE_2 (Mixed_7c) which is a MAX pool."""
    if cfg.fid_pools and block == "Mixed_7c":
        return _maxpool3(x, stride=1, pad=1)
    return _avgpool3s1p1(x, count_include_pad=not cfg.fid_pools)


# ---------------------------------------------------------------------------
# blocks — channel plans and wiring per torchvision's published inception.py


def _init_block_a(keys, c_in: int, pool_f: int):
    k = iter(keys)
    return {
        "branch1x1": _bconv_init(next(k), 1, 1, c_in, 64),
        "branch5x5_1": _bconv_init(next(k), 1, 1, c_in, 48),
        "branch5x5_2": _bconv_init(next(k), 5, 5, 48, 64),
        "branch3x3dbl_1": _bconv_init(next(k), 1, 1, c_in, 64),
        "branch3x3dbl_2": _bconv_init(next(k), 3, 3, 64, 96),
        "branch3x3dbl_3": _bconv_init(next(k), 3, 3, 96, 96),
        "branch_pool": _bconv_init(next(k), 1, 1, c_in, pool_f),
    }


def _apply_block_a(p, x, cfg, block):
    b1 = _bconv(p["branch1x1"], x)
    b5 = _bconv(p["branch5x5_2"], _bconv(p["branch5x5_1"], x), pad=(2, 2))
    b3 = _bconv(p["branch3x3dbl_1"], x)
    b3 = _bconv(p["branch3x3dbl_2"], b3, pad=(1, 1))
    b3 = _bconv(p["branch3x3dbl_3"], b3, pad=(1, 1))
    bp = _bconv(p["branch_pool"], _pool_branch(x, cfg, block))
    return jnp.concatenate([b1, b5, b3, bp], -1)


def _init_block_b(keys, c_in: int):
    k = iter(keys)
    return {
        "branch3x3": _bconv_init(next(k), 3, 3, c_in, 384),
        "branch3x3dbl_1": _bconv_init(next(k), 1, 1, c_in, 64),
        "branch3x3dbl_2": _bconv_init(next(k), 3, 3, 64, 96),
        "branch3x3dbl_3": _bconv_init(next(k), 3, 3, 96, 96),
    }


def _apply_block_b(p, x):
    b3 = _bconv(p["branch3x3"], x, stride=2)
    bd = _bconv(p["branch3x3dbl_1"], x)
    bd = _bconv(p["branch3x3dbl_2"], bd, pad=(1, 1))
    bd = _bconv(p["branch3x3dbl_3"], bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool3(x, stride=2)], -1)


def _init_block_c(keys, c_in: int, c7: int):
    k = iter(keys)
    return {
        "branch1x1": _bconv_init(next(k), 1, 1, c_in, 192),
        "branch7x7_1": _bconv_init(next(k), 1, 1, c_in, c7),
        "branch7x7_2": _bconv_init(next(k), 1, 7, c7, c7),
        "branch7x7_3": _bconv_init(next(k), 7, 1, c7, 192),
        "branch7x7dbl_1": _bconv_init(next(k), 1, 1, c_in, c7),
        "branch7x7dbl_2": _bconv_init(next(k), 7, 1, c7, c7),
        "branch7x7dbl_3": _bconv_init(next(k), 1, 7, c7, c7),
        "branch7x7dbl_4": _bconv_init(next(k), 7, 1, c7, c7),
        "branch7x7dbl_5": _bconv_init(next(k), 1, 7, c7, 192),
        "branch_pool": _bconv_init(next(k), 1, 1, c_in, 192),
    }


def _apply_block_c(p, x, cfg, block):
    b1 = _bconv(p["branch1x1"], x)
    b7 = _bconv(p["branch7x7_1"], x)
    b7 = _bconv(p["branch7x7_2"], b7, pad=(0, 3))
    b7 = _bconv(p["branch7x7_3"], b7, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_1"], x)
    bd = _bconv(p["branch7x7dbl_2"], bd, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_3"], bd, pad=(0, 3))
    bd = _bconv(p["branch7x7dbl_4"], bd, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_5"], bd, pad=(0, 3))
    bp = _bconv(p["branch_pool"], _pool_branch(x, cfg, block))
    return jnp.concatenate([b1, b7, bd, bp], -1)


def _init_block_d(keys, c_in: int):
    k = iter(keys)
    return {
        "branch3x3_1": _bconv_init(next(k), 1, 1, c_in, 192),
        "branch3x3_2": _bconv_init(next(k), 3, 3, 192, 320),
        "branch7x7x3_1": _bconv_init(next(k), 1, 1, c_in, 192),
        "branch7x7x3_2": _bconv_init(next(k), 1, 7, 192, 192),
        "branch7x7x3_3": _bconv_init(next(k), 7, 1, 192, 192),
        "branch7x7x3_4": _bconv_init(next(k), 3, 3, 192, 192),
    }


def _apply_block_d(p, x):
    b3 = _bconv(p["branch3x3_2"], _bconv(p["branch3x3_1"], x), stride=2)
    b7 = _bconv(p["branch7x7x3_1"], x)
    b7 = _bconv(p["branch7x7x3_2"], b7, pad=(0, 3))
    b7 = _bconv(p["branch7x7x3_3"], b7, pad=(3, 0))
    b7 = _bconv(p["branch7x7x3_4"], b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool3(x, stride=2)], -1)


def _init_block_e(keys, c_in: int):
    k = iter(keys)
    return {
        "branch1x1": _bconv_init(next(k), 1, 1, c_in, 320),
        "branch3x3_1": _bconv_init(next(k), 1, 1, c_in, 384),
        "branch3x3_2a": _bconv_init(next(k), 1, 3, 384, 384),
        "branch3x3_2b": _bconv_init(next(k), 3, 1, 384, 384),
        "branch3x3dbl_1": _bconv_init(next(k), 1, 1, c_in, 448),
        "branch3x3dbl_2": _bconv_init(next(k), 3, 3, 448, 384),
        "branch3x3dbl_3a": _bconv_init(next(k), 1, 3, 384, 384),
        "branch3x3dbl_3b": _bconv_init(next(k), 3, 1, 384, 384),
        "branch_pool": _bconv_init(next(k), 1, 1, c_in, 192),
    }


def _apply_block_e(p, x, cfg, block):
    b1 = _bconv(p["branch1x1"], x)
    b3 = _bconv(p["branch3x3_1"], x)
    b3 = jnp.concatenate(
        [_bconv(p["branch3x3_2a"], b3, pad=(0, 1)),
         _bconv(p["branch3x3_2b"], b3, pad=(1, 0))], -1)
    bd = _bconv(p["branch3x3dbl_2"], _bconv(p["branch3x3dbl_1"], x), pad=(1, 1))
    bd = jnp.concatenate(
        [_bconv(p["branch3x3dbl_3a"], bd, pad=(0, 1)),
         _bconv(p["branch3x3dbl_3b"], bd, pad=(1, 0))], -1)
    bp = _bconv(p["branch_pool"], _pool_branch(x, cfg, block))
    return jnp.concatenate([b1, b3, bd, bp], -1)


# ---------------------------------------------------------------------------
# full net

_STEM = (  # name, (kh, kw), c_in, c_out, stride, pad
    ("Conv2d_1a_3x3", (3, 3), 3, 32, 2, (0, 0)),
    ("Conv2d_2a_3x3", (3, 3), 32, 32, 1, (0, 0)),
    ("Conv2d_2b_3x3", (3, 3), 32, 64, 1, (1, 1)),
    ("Conv2d_3b_1x1", (1, 1), 64, 80, 1, (0, 0)),
    ("Conv2d_4a_3x3", (3, 3), 80, 192, 1, (0, 0)),
)
_BLOCKS_A = (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64), ("Mixed_5d", 288, 64))
_BLOCKS_C = (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160), ("Mixed_6e", 192))


def init_inception(key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))

    def ks(n):
        return [next(keys) for _ in range(n)]

    params: Dict[str, Any] = {}
    for name, (kh, kw), ci, co, _, _ in _STEM:
        params[name] = _bconv_init(next(keys), kh, kw, ci, co)
    for name, ci, pf in _BLOCKS_A:
        params[name] = _init_block_a(ks(7), ci, pf)
    params["Mixed_6a"] = _init_block_b(ks(4), 288)
    for name, c7 in _BLOCKS_C:
        params[name] = _init_block_c(ks(10), 768, c7)
    params["Mixed_7a"] = _init_block_d(ks(6), 768)
    params["Mixed_7b"] = _init_block_e(ks(9), 1280)
    params["Mixed_7c"] = _init_block_e(ks(9), 2048)
    return params


def inception_pooled(params, cfg: InceptionConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x [N, H, W, 3] in [-1, 1] (H, W >= ~75) -> pooled features [N, 2048]."""
    if cfg.transform_input:  # torchvision-pretrained input scaling
        ch = [x[..., 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
              x[..., 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
              x[..., 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5]
        x = jnp.stack(ch, -1)
    h = x
    for name, _, _, _, stride, pad in _STEM:
        h = _bconv(params[name], h, stride=stride, pad=pad)
        if name in ("Conv2d_2b_3x3", "Conv2d_4a_3x3"):
            h = _maxpool3(h, stride=2)
    for name, _, _ in _BLOCKS_A:
        h = _apply_block_a(params[name], h, cfg, name)
    h = _apply_block_b(params["Mixed_6a"], h)
    for name, _ in _BLOCKS_C:
        h = _apply_block_c(params[name], h, cfg, name)
    h = _apply_block_d(params["Mixed_7a"], h)
    h = _apply_block_e(params["Mixed_7b"], h, cfg, "Mixed_7b")
    h = _apply_block_e(params["Mixed_7c"], h, cfg, "Mixed_7c")
    return jnp.mean(h, (1, 2))  # adaptive avg pool to 1x1


def inception_features(params, cfg: InceptionConfig, images01: np.ndarray,
                       batch: int = 8) -> np.ndarray:
    """[N, H, W, 3] float in [0, 1] -> pooled features [N, 2048].

    pytorch-fid's preprocessing: bilinear resize to 299 then scale to [-1, 1]."""
    key = (id(params), cfg)
    fn = inception_features._jit.get(key)
    if fn is None:  # one compile per loaded weights (pred + gt calls share it)
        fn = jax.jit(lambda z: inception_pooled(params, cfg, z))
        inception_features._jit = {key: fn}
    out: List[np.ndarray] = []
    for i in range(0, len(images01), batch):
        chunk = jnp.asarray(images01[i : i + batch], jnp.float32)
        chunk = jax.image.resize(
            chunk, (chunk.shape[0], 299, 299, 3), "bilinear")
        out.append(np.asarray(fn(chunk * 2.0 - 1.0)))
    return np.concatenate(out, 0)


# ---------------------------------------------------------------------------
# torch-state-dict import


def inception_mapping(params) -> List[Tuple[str, Tuple]]:
    """(torch module prefix, pytree path) for every BasicConv2d; the pytree
    keys are torchvision's module names, so the mapping is the tree walk."""
    out: List[Tuple[str, Tuple]] = []
    for name, node in params.items():
        if "w" in node:
            out.append((name, (name,)))
        else:
            for b in node:
                out.append((f"{name}.{b}", (name, b)))
    return out


def import_inception_state(params, sd: Dict[str, np.ndarray]):
    """Fill `params` from a torch state dict (torchvision `inception_v3` or
    pytorch-fid `pt_inception` — same module names). `fc`/`AuxLogits` entries
    are ignored (FID uses pre-classifier pooled features)."""
    for prefix, path in inception_mapping(params):
        node = params
        for p in path:
            node = node[p]
        node["w"] = np.transpose(np.asarray(sd[f"{prefix}.conv.weight"]), (2, 3, 1, 0))
        node["scale"] = np.asarray(sd[f"{prefix}.bn.weight"])
        node["bias"] = np.asarray(sd[f"{prefix}.bn.bias"])
        node["mean"] = np.asarray(sd[f"{prefix}.bn.running_mean"])
        node["var"] = np.asarray(sd[f"{prefix}.bn.running_var"])
    return params


def load_inception_weights(path: str, cfg: InceptionConfig = InceptionConfig()):
    """Port a saved torch state dict into a ready pytree — the gated entry
    point for real weights (`MVIP_INCEPTION_WEIGHTS`)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params = jax.tree.map(np.asarray, init_inception(jax.random.PRNGKey(0)))
    return import_inception_state(params, sd), cfg


inception_features._jit = {}
