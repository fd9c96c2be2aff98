"""Trainer-side guidance construction + orchestrator config bridge."""

import jax
import jax.numpy as jnp
import numpy as np

from mvip_tpu.config import Config
from mvip_tpu.guidance.orchestrator import OrchestratorConfig
from mvip_tpu.train.guidance_setup import (
    _text_embed_from_prompt,
    build_guidance,
    needs_guidance,
)


def test_needs_guidance_flags():
    assert not needs_guidance(Config())
    assert needs_guidance(Config(is_rgb_guidance=True))
    assert needs_guidance(Config(sds_loss=True))
    assert needs_guidance(Config(is_colla_guidance=True))


def test_build_guidance_tiny_smoke():
    """Without sd_weights: tiny random stack, deterministic prompt embeddings."""
    cfg = Config(text="a bench", text_normal="a normal map", is_rgb_guidance=True)
    gm, mcfg, (s_rgb, s_nrm, s_col), pair_rgb, pair_nrm = build_guidance(cfg)
    assert pair_rgb.shape[0] == 2 and pair_nrm.shape[0] == 2
    # distinct prompts -> distinct embeddings; stable across calls
    assert not np.allclose(np.asarray(pair_rgb[1]), np.asarray(pair_nrm[1]))
    e1 = _text_embed_from_prompt("a bench", 8, 8)
    e2 = _text_embed_from_prompt("a bench", 8, 8)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    assert s_rgb.guidance_scale == cfg.rgb_guidance_scale
    assert s_nrm.guidance_scale == cfg.normal_guidance_scale
    assert mcfg.sds_loss_weight == cfg.sds_loss_weight


def test_build_guidance_sd_size_real_selects_production_arch(monkeypatch):
    """sd_size='real' must select the full SD-1.5 inpaint architecture and
    512px SDS (the weights-free production-scale training probe path).
    Init is stubbed — this test checks config plumbing, not the 860M init."""
    import mvip_tpu.train.guidance_setup as gs
    from mvip_tpu.guidance.unet import UNetConfig
    from mvip_tpu.guidance.vae import VAEConfig

    seen = {}

    def fake_init_unet(key, ucfg, dtype=jnp.float32):
        seen["ucfg"] = ucfg
        return {}

    def fake_init_vae(key, vcfg, dtype=jnp.float32):
        seen["vcfg"] = vcfg
        return {}

    monkeypatch.setattr(gs, "init_unet", fake_init_unet)
    monkeypatch.setattr(gs, "init_vae", fake_init_vae)
    cfg = Config(is_rgb_guidance=True, sd_size="real", text="x")
    gm, mcfg, (s_rgb, _, _), pair_rgb, _ = build_guidance(cfg)
    assert seen["ucfg"] == UNetConfig()          # production architecture
    assert seen["vcfg"] == VAEConfig()
    assert s_rgb.latent_size == 512
    assert pair_rgb.shape[1] == 77               # CLIP text length
    assert pair_rgb.shape[2] == UNetConfig().cross_attention_dim

    import pytest

    with pytest.raises(ValueError):
        build_guidance(Config(is_rgb_guidance=True, sd_size="bogus"))


def test_orchestrator_config_from_config():
    cfg = Config(is_rgb_guidance=True, rgb_guidance_scale=3.0,
                 theta_range=[10.0, 20.0], progressive_view=True)
    o = OrchestratorConfig.from_config(cfg)
    assert o.rgb_guidance_scale == 3.0
    assert o.theta_range == (10.0, 20.0)
    assert o.progressive_view is True


def test_orchestrator_progressive_view_relaxes(key):
    from mvip_tpu.guidance.orchestrator import GuidanceOrchestrator

    o = GuidanceOrchestrator(
        OrchestratorConfig(progressive_view=True, exp_end_iter=100,
                           theta_range=(0.0, 120.0), phi_range=(-180.0, 180.0))
    )
    t0 = tuple(o.theta_range)
    for i in range(20):
        o.cal_loss(jax.random.fold_in(key, i), i)
    # ranges widen toward the full ranges as training progresses
    assert o.theta_range != list(t0)
    assert o.theta_range[1] - o.theta_range[0] > 0
