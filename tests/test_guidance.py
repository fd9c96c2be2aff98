"""Guidance subsystem tests: tiny-config diffusion stack, SDS math, porting.

Follows the reference's oracle pattern (torchsearchsorted/test/): numpy/closed-
form ground truth, tiny shapes, exact structural checks. The full-size SD
checkpoint is unavailable here (zero egress), so correctness is pinned by (a)
closed-form schedule/gradient math, (b) export->import round trips through the
HF name mapping, (c) shape/finiteness/grad-flow on tiny random models.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvip_tpu.guidance.clip import (
    CLIPTextConfig,
    apply_clip_text,
    clip_image_features,
    clip_text_features,
    init_clip_text,
    init_clip_vision,
    preprocess_image,
    tiny_text_config,
    tiny_vision_config,
)
from mvip_tpu.guidance.scheduler import (
    DiffusionSchedule,
    add_noise,
    anneal_linear,
    anneal_sqrt,
    ddim_step,
)
from mvip_tpu.guidance.sds import (
    GuidanceModels,
    SDSConfig,
    inject_gradient,
    make_guidance_models,
    sds_colla_step,
    sds_normal_step,
    sds_rgb_step,
)
from mvip_tpu.guidance.unet import apply_unet, init_unet, tiny_unet_config
from mvip_tpu.guidance.vae import decode, encode, init_vae, tiny_vae_config
from mvip_tpu.guidance import perpneg, pipeline, poses, weights


# --- scheduler -----------------------------------------------------------------


def test_schedule_matches_closed_form():
    s = DiffusionSchedule()
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    np.testing.assert_allclose(s.betas, betas.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(
        s.alphas_cumprod, np.cumprod(1 - betas).astype(np.float32), rtol=1e-5
    )
    assert s.min_step == 20 and s.max_step == 980  # t_range=[0.02,0.98]


def test_add_noise_formula(key):
    s = DiffusionSchedule()
    a = jnp.asarray(s.alphas_cumprod)
    x0 = jax.random.normal(key, (2, 4, 4, 4))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = 100
    xt = add_noise(a, x0, eps, t)
    expect = np.sqrt(s.alphas_cumprod[t]) * x0 + np.sqrt(1 - s.alphas_cumprod[t]) * eps
    np.testing.assert_allclose(np.asarray(xt), np.asarray(expect), rtol=1e-5)


def test_anneal_endpoints():
    # reference: t = max - (max-min)*sqrt(i/20000)  (`sd_utils.py:363`)
    assert int(anneal_sqrt(0, 20, 980)) == 980
    assert int(anneal_sqrt(20000, 20, 980)) == 20
    assert int(anneal_sqrt(5000, 20, 980)) == int(980 - 960 * np.sqrt(0.25))
    assert int(anneal_linear(0, 20, 980)) == 980
    assert int(anneal_linear(10000, 20, 980)) == 20


def test_ddim_step_recovers_x0(key):
    """With the true eps, stepping to t_prev=-1 (abar=1) returns exactly x0."""
    s = DiffusionSchedule()
    a = jnp.asarray(s.alphas_cumprod)
    x0 = jax.random.normal(key, (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.fold_in(key, 7), x0.shape)
    t = 500
    xt = add_noise(a, x0, eps, t)
    out = ddim_step(a, xt, eps, jnp.asarray(t), jnp.asarray(-1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


# --- UNet / VAE ------------------------------------------------------------------


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_unet_shapes_and_per_batch_t(key):
    cfg = tiny_unet_config()
    params = init_unet(key, cfg)
    x = jax.random.normal(key, (2, 8, 8, cfg.in_channels))
    ctx = jax.random.normal(key, (2, 5, cfg.cross_attention_dim))
    out = apply_unet(params, cfg, x, jnp.array([10, 900]), ctx)
    assert out.shape == (2, 8, 8, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()
    # scalar t broadcast
    out2 = apply_unet(params, cfg, x, jnp.asarray(10), ctx)
    assert out2.shape == out.shape


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_unet_bf16_compute(key):
    cfg = tiny_unet_config()
    params = init_unet(key, cfg)
    x = jax.random.normal(key, (1, 8, 8, cfg.in_channels))
    ctx = jax.random.normal(key, (1, 5, cfg.cross_attention_dim))
    out = apply_unet(params, cfg, x, 5, ctx, compute_dtype=jnp.bfloat16)
    assert out.dtype == jnp.float32 and np.isfinite(np.asarray(out)).all()


@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_vae_roundtrip_shapes_and_grad(key):
    cfg = tiny_vae_config()
    params = init_vae(key, cfg)
    img = jax.random.uniform(key, (1, 16, 16, 3))
    z = encode(params, cfg, img, key)
    assert z.shape == (1, 16 // cfg.downscale, 16 // cfg.downscale, cfg.latent_channels)
    rec = decode(params, cfg, z)
    assert rec.shape == (1, 16, 16, 3)

    # encoder must carry gradient back to pixels (SDS path requirement)
    g = jax.grad(lambda im: jnp.sum(encode(params, cfg, im, key) ** 2))(img)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


# --- SDS -------------------------------------------------------------------------


def _tiny_guidance(key):
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(
        init_unet(key, ucfg), init_vae(jax.random.fold_in(key, 1), vcfg), ucfg, vcfg
    )
    scfg = SDSConfig(latent_size=16, compute_dtype=jnp.float32)
    te = jax.random.normal(jax.random.fold_in(key, 2), (2, 5, ucfg.cross_attention_dim))
    return gm, scfg, te


def test_inject_gradient_vjp(key):
    z = jax.random.normal(key, (1, 4, 4, 4))
    g = jax.random.normal(jax.random.fold_in(key, 1), z.shape)
    m = (jax.random.uniform(jax.random.fold_in(key, 2), (1, 4, 4, 1)) > 0.5).astype(
        jnp.float32
    )
    # d/dz [w * inject(z, g, m)] == w * g * m  (SpecifyGradient semantics)
    w = 0.25
    dz = jax.grad(lambda z: w * inject_gradient(z, g, m))(z)
    np.testing.assert_allclose(np.asarray(dz), np.asarray(w * g * m), rtol=1e-6)
    assert float(inject_gradient(z, g, m)) == 1.0


def test_sds_rgb_grad_flows_to_image(key):
    gm, scfg, te = _tiny_guidance(key)
    img = jax.random.uniform(key, (1, 12, 12, 3))
    mask = jnp.zeros((1, 12, 12, 1)).at[:, 4:8, 4:8].set(1.0)

    def loss_fn(im):
        return sds_rgb_step(jax.random.PRNGKey(3), gm, scfg, 100, im, mask, te)

    loss, g = jax.value_and_grad(loss_fn)(img)
    assert loss.shape == () and float(loss) == 1.0  # dummy forward value
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0  # SDS gradient reached the pixels


def test_sds_normal_step_runs(key):
    gm, scfg, te = _tiny_guidance(key)
    nm = jax.random.uniform(key, (1, 12, 12, 3))
    mask = jnp.ones((1, 12, 12, 1))
    loss = sds_normal_step(jax.random.PRNGKey(0), gm, scfg, 600, nm, mask, te,
                           normal_start=500)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("apply_mode", ["all", "last"])
@pytest.mark.parametrize(
    "over_neighbors",
    [False,
     pytest.param(True, marks=pytest.mark.slow)],  # reference-bug-parity flag
)
@pytest.mark.slow  # deep parity/e2e depth: full suite only (fast gate = smoke+unit)
def test_sds_colla_modes(key, apply_mode, over_neighbors):
    gm, scfg, te = _tiny_guidance(key)
    imgs = jax.random.uniform(key, (3, 12, 12, 3))
    masks = jnp.ones((3, 12, 12, 1))

    def loss_fn(ims):
        return sds_colla_step(jax.random.PRNGKey(1), gm, scfg, 50, ims, masks, te,
                              anneal_over_neighbors=over_neighbors,
                              colla_apply=apply_mode)

    g = jax.grad(loss_fn)(imgs)
    assert np.isfinite(np.asarray(g)).all()
    per_view = np.asarray(jnp.abs(g).sum((1, 2, 3)))
    if apply_mode == "last":
        assert per_view[-1] > 0 and per_view[0] == 0  # reference parity: last only
    else:
        assert (per_view > 0).all()  # consensus drives every view


# --- CLIP ------------------------------------------------------------------------


def test_clip_text_causal_and_features(key):
    cfg = tiny_text_config()
    params = init_clip_text(key, cfg)
    ids = jnp.array([[1, 5, 9, cfg.eos_token_id, 0, 0, 0, 0]])
    h = apply_clip_text(params, cfg, ids)
    assert h.shape == (1, 8, cfg.hidden)
    # causality: changing a later token must not affect earlier hidden states
    ids2 = ids.at[0, 5].set(7)
    h2 = apply_clip_text(params, cfg, ids2)
    np.testing.assert_allclose(np.asarray(h[:, :5]), np.asarray(h2[:, :5]), atol=1e-5)

    cfg_p = dataclasses.replace(cfg, projection_dim=6)
    params_p = init_clip_text(key, cfg_p)
    z = clip_text_features(params_p, cfg_p, ids)
    assert z.shape == (1, 6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1), 1.0, rtol=1e-5)


def test_clip_vision_features(key):
    cfg = tiny_vision_config()
    params = init_clip_vision(key, cfg)
    imgs = jax.random.uniform(key, (2, 20, 20, 3))
    z = clip_image_features(params, cfg, preprocess_image(imgs, cfg))
    assert z.shape == (2, cfg.projection_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1), 1.0, rtol=1e-5)


# --- perp-neg ---------------------------------------------------------------------


def test_weighted_perpendicular_aggregator_vs_loop(rng):
    B, K = 2, 3
    d = rng.normal(size=(B * K, 4, 4, 2)).astype(np.float32)
    w = rng.normal(size=(B * K,)).astype(np.float32)
    w[:B] = 1.0
    out = np.asarray(perpneg.weighted_perpendicular_aggregator(
        jnp.asarray(d), jnp.asarray(w), B))

    # oracle: reference's per-sample loop (`perpneg_utils.py:17-48`)
    ds = d.reshape(K, B, -1)
    ws = w.reshape(K, B)
    main = ds[0]
    acc = np.zeros_like(main)
    for i in range(1, K):
        for b in range(B):
            if abs(ws[i, b]) > 1e-4:
                x, y = ds[i, b], main[b]
                perp = x - (np.dot(x, y) / max(np.dot(y, y), 1e-6)) * y
                acc[b] += ws[i, b] * perp
    expect = (acc + main).reshape(B, 4, 4, 2)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_pos_neg_text_embeddings_front_back():
    emb = {k: jnp.full((1, 4, 3), v) for k, v in
           [("front", 1.0), ("side", 2.0), ("back", 3.0)]}
    z, w = perpneg.get_pos_neg_text_embeddings(emb, 0.0)  # looking at front
    assert z.shape == (3, 4, 3) and float(w[0]) == 1.0
    np.testing.assert_allclose(np.asarray(z[0]), 1.0)  # pure front at az=0
    z2, _ = perpneg.get_pos_neg_text_embeddings(emb, 180.0)
    np.testing.assert_allclose(np.asarray(z2[0]), 3.0)  # pure back at az=180


# --- poses -------------------------------------------------------------------------


def test_rand_poses_orthonormal(key):
    p, dirs, th, ph, r = poses.rand_poses(key, 4, return_dirs=True)
    assert p.shape == (4, 4, 4) and dirs.shape == (4,)
    rot = np.asarray(p[:, :3, :3])
    eye = np.einsum("bij,bkj->bik", rot, rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)
    # camera centers on the sampled radii
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(p[:, :3, 3]), axis=-1), np.asarray(r), rtol=1e-5
    )


def test_view_direction_buckets():
    th = jnp.array([np.pi / 2] * 4 + [0.1, np.pi - 0.1])
    ph = jnp.array([0.0, np.pi / 2, np.pi, 3 * np.pi / 2, 0.0, 0.0])
    d = poses.get_view_direction(th, ph, overhead=0.3, front=np.pi / 3)
    assert list(np.asarray(d)) == [0, 1, 2, 3, 4, 5]


# --- pipeline ----------------------------------------------------------------------


def test_produce_latents_and_inpaint(key):
    gm, scfg, te = _tiny_guidance(key)
    lat = pipeline.produce_latents(key, gm, te, num_steps=3, height=16, width=16)
    assert lat.shape == (1, 8, 8, 4) and np.isfinite(np.asarray(lat)).all()

    img = jax.random.uniform(key, (1, 12, 12, 3))
    mask = jnp.zeros((1, 12, 12, 1)).at[:, 3:9, 3:9].set(1.0)
    out = pipeline.inpaint_image(key, gm, te, img, mask, num_steps=2, size=16)
    assert out.shape == (1, 16, 16, 3)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


# --- weight porting round trip -------------------------------------------------------


def _assert_tree_allclose(a, b):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=1e-6), a, b)


def test_unet_state_dict_roundtrip(key):
    cfg = tiny_unet_config()
    src = jax.tree.map(np.asarray, init_unet(key, cfg))
    dst = jax.tree.map(np.asarray, init_unet(jax.random.fold_in(key, 1), cfg))
    m = weights.unet_mapping(cfg)
    sd = weights.export_state_dict(src, m)
    weights.import_state_dict(dst, sd, m)
    _assert_tree_allclose(src, dst)
    # and the ported params still run
    x = jnp.zeros((1, 8, 8, cfg.in_channels))
    ctx = jnp.zeros((1, 5, cfg.cross_attention_dim))
    assert apply_unet(dst, cfg, x, 1, ctx).shape == (1, 8, 8, 4)


def test_vae_state_dict_roundtrip(key):
    cfg = tiny_vae_config()
    src = jax.tree.map(np.asarray, init_vae(key, cfg))
    dst = jax.tree.map(np.asarray, init_vae(jax.random.fold_in(key, 1), cfg))
    m = weights.vae_mapping(cfg)
    weights.import_state_dict(dst, weights.export_state_dict(src, m), m)
    _assert_tree_allclose(src, dst)


def test_clip_state_dict_roundtrip(key):
    cfg = tiny_text_config()
    src = jax.tree.map(np.asarray, init_clip_text(key, cfg))
    dst = jax.tree.map(np.asarray, init_clip_text(jax.random.fold_in(key, 1), cfg))
    m = weights.clip_text_mapping(cfg)
    weights.import_state_dict(dst, weights.export_state_dict(src, m), m)
    _assert_tree_allclose(src, dst)


def test_full_size_mapping_is_complete():
    """Every full-size SD-1.5-inpaint parameter tensor appears in the mapping
    (checkpoint-name coverage without the checkpoint)."""
    ucfg, vcfg, tcfg = weights.sd15_inpaint_configs()
    names = [e[0] for e in weights.unet_mapping(ucfg)]
    assert "conv_in" in names and "mid_block.attentions.0.proj_out" in names
    assert "up_blocks.3.resnets.2.conv_shortcut" in names
    assert len(names) == len(set(names))
    vnames = [e[0] for e in weights.vae_mapping(vcfg)]
    assert "decoder.up_blocks.3.resnets.0.conv_shortcut" in vnames
    tnames = [e[0] for e in weights.clip_text_mapping(tcfg)]
    assert "text_model.encoder.layers.11.mlp.fc2" in tnames


def test_vae_encode_compute_dtype_bf16_differentiable():
    """Production runs the frozen VAE encoder in bf16 (the reference loads
    its SD pipe fp16, sd_utils.py:69-74). The bf16 path must be
    differentiable (conv2d's transpose once rejected mixed f32/bf16
    operand pairs) and its input-gradient must stay within bf16 noise of
    the f32 path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvip_tpu.guidance.vae import VAEConfig, encode, init_vae

    cfg = VAEConfig(block_channels=(8, 16), latent_channels=4, norm_groups=4)
    p = init_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))

    def loss(x, cdt):
        return encode(p, cfg, x, jax.random.PRNGKey(2),
                      compute_dtype=cdt).sum()

    g_bf16 = jax.grad(lambda x: loss(x, jnp.bfloat16))(x)
    g_f32 = jax.grad(lambda x: loss(x, None))(x)
    assert g_bf16.dtype == jnp.float32
    assert np.isfinite(np.asarray(g_bf16)).all()
    rel = float(jnp.abs(g_bf16 - g_f32).mean()
                / (jnp.abs(g_f32).mean() + 1e-9))
    assert rel < 0.15, rel


def test_attention_query_chunking_matches():
    """Query-chunked attention (the memory path for the batch-10 colla CFG
    UNet at real SD scale — f32[10,8,4096,4096] logits OOM a 16 GB v5e)
    matches the materialized path to float-fusion noise, with and without an
    additive mask, values and grads (softmax is independent per query row;
    remat per chunk)."""
    import jax
    import jax.numpy as jnp

    from mvip_tpu.guidance.layers import attention, attn_init

    key = jax.random.PRNGKey(3)
    p = attn_init(key, 64, 8, 8)
    x = jax.random.normal(key, (3, 100, 64))
    m = jnp.where(jnp.tril(jnp.ones((100, 100))) > 0, 0.0, -1e9)
    for mask in (None, m):
        a = attention(p, x, heads=8, mask=mask)
        b = attention(p, x, heads=8, mask=mask, q_chunk=32)
        assert float(jnp.abs(a - b).max()) < 1e-6
    g1 = jax.grad(lambda xx: attention(p, xx, heads=8).sum())(x)
    g2 = jax.grad(lambda xx: attention(p, xx, heads=8, q_chunk=32).sum())(x)
    assert float(jnp.abs(g1 - g2).max()) < 1e-6


@pytest.mark.slow  # lax.map VAE encode compiles ~1 min on CPU: full suite only
def test_encode_latents_view_chunked_path(key, monkeypatch):
    """Large multi-view batches encode per-view under lax.map + remat (the
    colla real-scale memory path); gradients flow and shapes match the
    batched contract. The pixel threshold is monkeypatched down so the test
    runs at tiny shapes."""
    from mvip_tpu.guidance import sds as sds_mod

    monkeypatch.setattr(sds_mod, "_VAE_CHUNK_MIN_PIXELS", 32 * 32)
    ucfg, vcfg = tiny_unet_config(), tiny_vae_config()
    gm = make_guidance_models(init_unet(key, ucfg), init_vae(key, vcfg),
                              ucfg, vcfg)
    img = jax.random.uniform(key, (3, 32, 32, 3))
    d = vcfg.downscale

    def f(im):
        z0, mz = sds_mod._encode_latents(key, gm, im, im * 0.5)
        assert z0.shape == mz.shape == (3, 32 // d, 32 // d, vcfg.latent_channels)
        return z0.sum()

    v, g = jax.value_and_grad(f)(img)
    assert jnp.isfinite(v) and float(jnp.abs(g).sum()) > 0.0

    # below the threshold the batched path serves (shape contract identical)
    monkeypatch.setattr(sds_mod, "_VAE_CHUNK_MIN_PIXELS", 512 * 512)
    z0, mz = sds_mod._encode_latents(key, gm, img, img * 0.5)
    assert z0.shape == (3, 32 // d, 32 // d, vcfg.latent_channels)
