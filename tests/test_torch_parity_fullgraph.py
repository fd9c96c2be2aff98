"""FULL-GRAPH golden parity: our UNet/VAE vs a hand-built torch reference.

`tests/test_torch_parity.py` validates primitives (conv/GN/attention) and the
complete CLIP text tower; this module closes the remaining gap (VERDICT r1
missing #2): the whole UNet/VAE block graphs. diffusers is not installed in
this image, so the torch reference models are constructed HERE, by hand, to
diffusers' published SD-1.x architecture (`UNet2DConditionModel` /
`AutoencoderKL` as consumed by the reference, `DS_NeRF/guidance/sd_utils.py:
69-88,390-408`) with the exact state-dict names — ported through
`guidance/weights.py`'s real mapping. A block-wiring mistake (skip order,
GEGLU split, attention scaling, time-embedding convention, down/upsample
padding) fails these tests without ever loading real SD weights.

Architectural facts encoded here (diffusers SD-1.x):
- attention to_q/to_k/to_v are bias=False in the UNet transformer blocks,
  bias=True in the VAE mid attention; to_out.0 always has bias
- GEGLU: proj -> chunk(2) -> value * exact-erf gelu(gate)
- timestep embedding: flip_sin_to_cos=True ([cos|sin]), freq_shift=0
- resnet GN eps 1e-5 (UNet) / 1e-6 (VAE); transformer GN eps 1e-6
- UNet downsample: stride-2 conv, symmetric pad 1; VAE encoder downsample:
  asymmetric (0,1,0,1) pad + VALID stride-2 conv
- up blocks: hidden = cat([hidden, skip]) along channels, resnets consume
  layers_per_block+1 skips, upsample = nearest-2x + conv
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mvip_tpu.guidance import weights as W
from mvip_tpu.guidance.unet import apply_unet, init_unet, tiny_unet_config
from mvip_tpu.guidance.vae import (
    decode,
    encode_moments,
    init_vae,
    tiny_vae_config,
)


# --- torch reference blocks (diffusers SD-1.x architecture, exact names) -----


class TResnet(nn.Module):
    def __init__(self, c_in, c_out, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(min(groups, c_in), c_in, eps=eps)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
        if temb_dim:
            self.time_emb_proj = nn.Linear(temb_dim, c_out)
        self.norm2 = nn.GroupNorm(min(groups, c_out), c_out, eps=eps)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
        if c_in != c_out:
            self.conv_shortcut = nn.Conv2d(c_in, c_out, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TAttention(nn.Module):
    def __init__(self, q_dim, heads, dim_head, ctx_dim=None, qkv_bias=False):
        super().__init__()
        inner = heads * dim_head
        ctx_dim = ctx_dim or q_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(q_dim, inner, bias=qkv_bias)
        self.to_k = nn.Linear(ctx_dim, inner, bias=qkv_bias)
        self.to_v = nn.Linear(ctx_dim, inner, bias=qkv_bias)
        self.to_out = nn.ModuleList([nn.Linear(inner, q_dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, tq, _ = x.shape
        q = self.to_q(x).view(b, tq, self.heads, self.dim_head)
        k = self.to_k(context).view(b, -1, self.heads, self.dim_head)
        v = self.to_v(context).view(b, -1, self.heads, self.dim_head)
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.dim_head)
        w = logits.softmax(-1)
        out = torch.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, tq, -1)
        return self.to_out[0](out)


class TGEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, 2 * inner)

    def forward(self, x):
        val, gate = self.proj(x).chunk(2, dim=-1)
        return val * F.gelu(gate)


class TFeedForward(nn.Module):
    """diffusers FeedForward: state-dict names ff.net.0.proj / ff.net.2."""

    def __init__(self, c):
        super().__init__()
        self.net = nn.ModuleList([TGEGLU(c, 4 * c), nn.Identity(),
                                  nn.Linear(4 * c, c)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


class TBasicTransformerBlock(nn.Module):
    def __init__(self, c, heads, ctx_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(c)
        self.attn1 = TAttention(c, heads, c // heads)
        self.norm2 = nn.LayerNorm(c)
        self.attn2 = TAttention(c, heads, c // heads, ctx_dim=ctx_dim)
        self.norm3 = nn.LayerNorm(c)
        self.ff = TFeedForward(c)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class TTransformer2D(nn.Module):
    def __init__(self, c, heads, ctx_dim, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(min(groups, c), c, eps=1e-6)
        self.proj_in = nn.Conv2d(c, c, 1)
        self.transformer_blocks = nn.ModuleList(
            [TBasicTransformerBlock(c, heads, ctx_dim)]
        )
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.transformer_blocks[0](y, context)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + residual


def t_timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    ang = t.float()[:, None] * freqs[None]
    return torch.cat([ang.cos(), ang.sin()], -1)  # flip_sin_to_cos=True


class TUNet(nn.Module):
    """diffusers UNet2DConditionModel (SD-1.x layout) at the tiny config."""

    def __init__(self, cfg):
        super().__init__()
        ch, g = cfg.block_channels, cfg.norm_groups
        ted = cfg.time_embed_dim
        self.cfg = cfg
        self.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(ch[0], ted)
        self.time_embedding.linear_2 = nn.Linear(ted, ted)

        self.down_blocks = nn.ModuleList()
        c_prev = ch[0]
        for i, c in enumerate(ch):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(c_prev if j == 0 else c, c, ted, g)
                 for j in range(cfg.layers_per_block)]
            )
            if cfg.cross_attn[i]:
                blk.attentions = nn.ModuleList(
                    [TTransformer2D(c, cfg.heads, cfg.cross_attention_dim, g)
                     for _ in range(cfg.layers_per_block)]
                )
            if i < len(ch) - 1:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(c, c, 3, stride=2, padding=1)
            self.down_blocks.append(blk)
            c_prev = c

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [TResnet(ch[-1], ch[-1], ted, g), TResnet(ch[-1], ch[-1], ted, g)]
        )
        self.mid_block.attentions = nn.ModuleList(
            [TTransformer2D(ch[-1], cfg.heads, cfg.cross_attention_dim, g)]
        )

        skip_ch = [ch[0]]
        for i, c in enumerate(ch):
            skip_ch += [c] * cfg.layers_per_block
            if i < len(ch) - 1:
                skip_ch.append(c)
        self.up_blocks = nn.ModuleList()
        c_prev = ch[-1]
        for i, c in enumerate(reversed(ch)):
            ridx = len(ch) - 1 - i
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for j in range(cfg.layers_per_block + 1):
                c_skip = skip_ch.pop()
                blk.resnets.append(
                    TResnet((c_prev if j == 0 else c) + c_skip, c, ted, g)
                )
            if cfg.cross_attn[ridx]:
                blk.attentions = nn.ModuleList(
                    [TTransformer2D(c, cfg.heads, cfg.cross_attention_dim, g)
                     for _ in range(cfg.layers_per_block + 1)]
                )
            if i < len(ch) - 1:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(c, c, 3, padding=1)
            self.up_blocks.append(blk)
            c_prev = c

        self.conv_norm_out = nn.GroupNorm(min(g, ch[0]), ch[0], eps=1e-5)
        self.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, x, t, context):
        temb = t_timestep_embedding(t.expand(x.shape[0]), self.cfg.block_channels[0])
        temb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(temb)))
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, context)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, context)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVAEAttnBlock(nn.Module):
    """diffusers VAE mid attention: single head, qkv WITH bias, names at the
    attention level (group_norm / to_q / ... / to_out.0)."""

    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(min(groups, c), c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])
        self.c = c

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        wts = (q @ k.transpose(1, 2) / math.sqrt(c)).softmax(-1)
        y = self.to_out[0](wts @ v)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return x + y


class TVAE(nn.Module):
    """diffusers AutoencoderKL (SD layout) at the tiny config."""

    def __init__(self, cfg):
        super().__init__()
        ch, g, lat = cfg.block_channels, cfg.norm_groups, cfg.latent_channels
        self.cfg = cfg
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        c_prev = ch[0]
        for i, c in enumerate(ch):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(c_prev if j == 0 else c, c, None, g, eps=1e-6)
                 for j in range(cfg.layers_per_block)]
            )
            if i < len(ch) - 1:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(c, c, 3, stride=2, padding=0)
            enc.down_blocks.append(blk)
            c_prev = c
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [TResnet(ch[-1], ch[-1], None, g, 1e-6),
             TResnet(ch[-1], ch[-1], None, g, 1e-6)]
        )
        enc.mid_block.attentions = nn.ModuleList([TVAEAttnBlock(ch[-1], g)])
        enc.conv_norm_out = nn.GroupNorm(min(g, ch[-1]), ch[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(ch[-1], 2 * lat, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * lat, 2 * lat, 1)

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(lat, ch[-1], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList(
            [TResnet(ch[-1], ch[-1], None, g, 1e-6),
             TResnet(ch[-1], ch[-1], None, g, 1e-6)]
        )
        dec.mid_block.attentions = nn.ModuleList([TVAEAttnBlock(ch[-1], g)])
        dec.up_blocks = nn.ModuleList()
        c_prev = ch[-1]
        for i, c in enumerate(reversed(ch)):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(c_prev if j == 0 else c, c, None, g, 1e-6)
                 for j in range(cfg.layers_per_block + 1)]
            )
            if i < len(ch) - 1:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(c, c, 3, padding=1)
            dec.up_blocks.append(blk)
            c_prev = c
        dec.conv_norm_out = nn.GroupNorm(min(g, ch[0]), ch[0], eps=1e-6)
        dec.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)
        self.decoder = dec
        self.post_quant_conv = nn.Conv2d(lat, lat, 1)

    def encode_moments(self, x):
        enc = self.encoder
        h = enc.conv_in(x)
        for blk in enc.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))  # SD's asymmetric encoder pad
                h = blk.downsamplers[0].conv(h)
        h = enc.mid_block.resnets[0](h)
        h = enc.mid_block.attentions[0](h)
        h = enc.mid_block.resnets[1](h)
        h = enc.conv_out(F.silu(enc.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        dec = self.decoder
        h = dec.conv_in(self.post_quant_conv(z))
        h = dec.mid_block.resnets[0](h)
        h = dec.mid_block.attentions[0](h)
        h = dec.mid_block.resnets[1](h)
        for blk in dec.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return dec.conv_out(F.silu(dec.conv_norm_out(h)))


def _clean_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_unet_full_forward_matches_torch(rng):
    cfg = tiny_unet_config()
    torch.manual_seed(0)
    tm = TUNet(cfg).eval()

    params = jax.tree.map(np.asarray, init_unet(jax.random.PRNGKey(0), cfg))
    W.import_state_dict(params, _clean_sd(tm), W.unet_mapping(cfg))

    x = rng.normal(size=(2, 16, 16, cfg.in_channels)).astype(np.float32)
    ctx = rng.normal(size=(2, 5, cfg.cross_attention_dim)).astype(np.float32)
    t = np.array([37.0], np.float32)

    ours = np.asarray(apply_unet(params, cfg, jnp.asarray(x), jnp.asarray(t[0]),
                                 jnp.asarray(ctx)))
    with torch.no_grad():
        theirs = tm(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
        ).numpy()
    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 3, 1)),
                               atol=1e-4)


def test_vae_full_forward_matches_torch(rng):
    cfg = tiny_vae_config()
    torch.manual_seed(1)
    tm = TVAE(cfg).eval()

    params = jax.tree.map(np.asarray, init_vae(jax.random.PRNGKey(0), cfg))
    W.import_state_dict(params, _clean_sd(tm), W.vae_mapping(cfg))

    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    ours_m = np.asarray(encode_moments(params, cfg, jnp.asarray(x)))
    with torch.no_grad():
        theirs_m = tm.encode_moments(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ).numpy()
    np.testing.assert_allclose(ours_m, np.transpose(theirs_m, (0, 2, 3, 1)),
                               atol=1e-4)

    z = rng.normal(size=(2, 8, 8, cfg.latent_channels)).astype(np.float32)
    # decode() takes SCALED latents (divides by scaling_factor); feed the torch
    # model the unscaled values
    ours_d = np.asarray(decode(params, cfg, jnp.asarray(z)))
    with torch.no_grad():
        theirs_d = tm.decode(
            torch.from_numpy(np.transpose(z / cfg.scaling_factor, (0, 3, 1, 2)))
        ).numpy()
    np.testing.assert_allclose(ours_d, np.transpose(theirs_d, (0, 2, 3, 1)),
                               atol=1e-4)


def test_unet_qkv_nobias_import(rng):
    """Regression: diffusers UNet attention has NO q/k/v biases; the import
    must zero ours rather than KeyError (weights.py `_import_entry`)."""
    cfg = tiny_unet_config()
    torch.manual_seed(0)
    sd = _clean_sd(TUNet(cfg).eval())
    assert not any(k.endswith("to_q.bias") for k in sd)
    params = jax.tree.map(np.asarray, init_unet(jax.random.PRNGKey(0), cfg))
    W.import_state_dict(params, sd, W.unet_mapping(cfg))
    attn = params["down"][0]["attns"][0]["attn1"]
    assert float(np.abs(attn["q"]["b"]).max()) == 0.0


class TLPIPS(nn.Module):
    """Hand-built replica of the lpips package's published computation (Zhang
    et al. 2018): scaling layer -> VGG-style conv taps -> channel-unit-
    normalize -> squared diff -> non-negative 1x1 lin heads -> spatial mean ->
    sum over taps. diffusers-style hand construction since neither lpips nor
    torchvision is installed here."""

    def __init__(self, stages):
        super().__init__()
        self.stages = stages
        convs = []
        c_in = 3
        for c, n in stages:
            for _ in range(n):
                convs.append(nn.Conv2d(c_in, c, 3, padding=1))
                c_in = c
        self.convs = nn.ModuleList(convs)
        self.lins = nn.ModuleList(
            [nn.Conv2d(c, 1, 1, bias=False) for c, _ in stages]
        )
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        )
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        )

    def taps(self, x):
        h = (x - self.shift) / self.scale
        out, k = [], 0
        for si, (c, n) in enumerate(self.stages):
            if si > 0:
                h = F.max_pool2d(h, 2)
            for _ in range(n):
                h = F.relu(self.convs[k](h))
                k += 1
            out.append(h)
        return out

    def forward(self, a, b):
        total = 0.0
        for ta, tb, lin in zip(self.taps(a), self.taps(b), self.lins):
            na = ta / (ta.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            nb = tb / (tb.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            d2 = (na - nb).pow(2)
            w = lin.weight.clamp(min=0.0)
            total = total + F.conv2d(d2, w).mean((1, 2, 3))
        return total


def test_lpips_matches_torch_replica(rng):
    from mvip_tpu.eval.lpips_jax import (
        import_lpips_state,
        init_lpips,
        lpips,
        tiny_lpips_config,
    )

    cfg = tiny_lpips_config()
    torch.manual_seed(2)
    tm = TLPIPS(cfg.stages).eval()

    # rename the flat conv list to torchvision vgg `features.{idx}` names and
    # the lins to `lin{i}.model.1` — the layout load_lpips_weights expects
    sd = {}
    idx, k = 0, 0
    for si, (c, n) in enumerate(cfg.stages):
        if si > 0:
            idx += 1
        for _ in range(n):
            sd[f"features.{idx}.weight"] = tm.convs[k].weight.detach().numpy()
            sd[f"features.{idx}.bias"] = tm.convs[k].bias.detach().numpy()
            idx += 2
            k += 1
    for i, lin in enumerate(tm.lins):
        sd[f"lin{i}.model.1.weight"] = lin.weight.detach().numpy()

    params = jax.tree.map(np.asarray, init_lpips(jax.random.PRNGKey(0), cfg))
    import_lpips_state(params, sd, cfg)

    a = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(lpips(params, cfg, jnp.asarray(a), jnp.asarray(b)))
    with torch.no_grad():
        theirs = tm(
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2)),
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    # identity property: d(x, x) == 0
    zero = np.asarray(lpips(params, cfg, jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(zero, 0.0, atol=1e-7)
