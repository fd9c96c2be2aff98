"""StepTimer async-honesty semantics + MFU accounting (VERDICT r2 weak #1:
an unsynced window close measured dispatch, not execution, and overstated
committed rays/s by 420x)."""

import time

import pytest

from mvip_tpu.utils.profiling import (
    StepTimer,
    _mlp_fwd_flops_per_point,
    train_flops_per_ray,
)


def test_timer_never_closes_on_unsynced_ticks():
    t = StepTimer(rays_per_step=10, window=3)
    assert t.tick(synced=True) is None  # opens the window
    for _ in range(20):  # way past `window`, but no sync -> never closes
        assert t.tick(synced=False) is None
    rate = t.tick(synced=True)
    assert rate is not None and rate > 0
    # the closed window covered all 21 counted steps, not `window`
    # (rate = steps*rays/dt; dt tiny here, just check it used 21 steps)


def test_timer_window_opens_only_when_synced():
    t = StepTimer(rays_per_step=10, window=2)
    assert t.tick(synced=False) is None  # cannot open unsynced
    assert t._t0 is None
    assert t.tick(synced=True) is None  # opens
    assert t._t0 is not None


def test_timer_rate_measures_wall_clock():
    t = StepTimer(rays_per_step=100, window=2)
    t.tick(synced=True)
    time.sleep(0.05)
    t.tick(synced=False)
    time.sleep(0.05)
    rate = t.tick(synced=True)
    # 2 steps x 100 rays over >= 0.1 s -> rate <= 2000, far below the
    # dispatch-rate figure an unsynced close would produce
    assert rate is not None and rate <= 2000.0


def test_mlp_flops_per_point_matches_hand_count():
    from mvip_tpu.models.nerf_mlp import NeRFMLPConfig

    cfg = NeRFMLPConfig()  # 8x256, PE 10/4, skip at 4, viewdirs
    in_ch, w, in_v = 63, 256, 27
    hidden = sum((w + in_ch if i + 1 in (4,) else w) * w for i in range(7))
    expect = 2 * (in_ch * w + hidden + w * 1 + w * w
                  + (w + in_v) * (w // 2) + (w // 2) * 3)
    assert _mlp_fwd_flops_per_point(cfg) == expect


def test_train_flops_per_ray_scales_with_samples_and_keep():
    from mvip_tpu.models.nerf_mlp import NeRFMLPConfig

    cfg = NeRFMLPConfig()
    full = train_flops_per_ray("mlp", cfg, 64, 64)
    half = train_flops_per_ray("mlp", cfg, 64, 64, sample_keep=0.5)
    assert full is not None and abs(half / full - 0.5) < 1e-9
    coarse_only = train_flops_per_ray("mlp", cfg, 64, 0)
    assert coarse_only < full


def test_train_flops_per_ray_hash_counts_heads_only():
    from mvip_tpu.models.nerf_hashgrid import HashGridConfig

    cfg = HashGridConfig(log2_table_size=15)
    big = HashGridConfig(log2_table_size=19)
    # MODEL flops exclude the gather (table size must not matter)
    assert train_flops_per_ray("hashgrid_fused", cfg, 64, 64) == \
        train_flops_per_ray("hashgrid", big, 64, 64)
    assert train_flops_per_ray("unknown", cfg, 64, 64) is None


@pytest.mark.slow  # compiles the tiny UNet/VAE for XLA cost analysis (~25 s each)
def test_unet_flops_within_xla_cost_analysis_band():
    """The analytic walker mirrors apply_unet: XLA's own compiled flop count
    (which adds elementwise norms/SiLU/softmax on top of matmuls) must sit AT
    or ABOVE the analytic matmul count, and within a small factor of it."""
    import jax
    import jax.numpy as jnp

    from mvip_tpu.guidance.unet import apply_unet, init_unet, tiny_unet_config
    from mvip_tpu.utils.profiling import unet_fwd_flops

    cfg = tiny_unet_config()
    h = w = 16
    params = init_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, h, w, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    compiled = jax.jit(lambda p, x, t, c: apply_unet(p, cfg, x, t, c)).lower(
        params, x, t, ctx
    ).compile()
    xla = compiled.cost_analysis()["flops"]
    analytic = unet_fwd_flops(cfg, h, w, batch=1, ctx_tokens=7)
    assert analytic <= xla * 1.02           # never overcounts real work
    assert xla <= analytic * 2.5            # elementwise overhead only


@pytest.mark.slow  # compiles the tiny UNet/VAE for XLA cost analysis (~25 s each)
def test_vae_encode_flops_within_xla_cost_analysis_band():
    import jax
    import jax.numpy as jnp

    from mvip_tpu.guidance.vae import encode_moments, init_vae, tiny_vae_config
    from mvip_tpu.utils.profiling import vae_encode_fwd_flops

    cfg = tiny_vae_config()
    h = w = 32
    params = init_vae(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, h, w, 3))
    compiled = jax.jit(lambda p, x: encode_moments(p, cfg, x)).lower(
        params, x
    ).compile()
    xla = compiled.cost_analysis()["flops"]
    analytic = vae_encode_fwd_flops(cfg, h, w)
    assert analytic <= xla * 1.02
    assert xla <= analytic * 2.5


def test_real_scale_sds_flops_magnitude():
    """Pin the real-SD-1.5-scale magnitudes so a walker regression can't silently
    skew MFU: UNet ~0.8 TFLOPs fwd at 64x64 latents, VAE encoder ~1.1 TFLOPs at
    512^2 (published SD-1.5 counts are the same ballpark)."""
    from mvip_tpu.guidance.unet import UNetConfig
    from mvip_tpu.guidance.vae import VAEConfig
    from mvip_tpu.utils.profiling import (
        sds_call_flops,
        unet_fwd_flops,
        vae_encode_fwd_flops,
    )

    u = unet_fwd_flops(UNetConfig(), 64, 64)
    v = vae_encode_fwd_flops(VAEConfig(), 512, 512)
    assert 0.5e12 < u < 1.2e12
    assert 0.7e12 < v < 1.7e12
    # one rgb-SDS call = 4 vae-encode-equivalents + the batched CFG pair
    assert abs(sds_call_flops(UNetConfig(), VAEConfig(), 512) - (4 * v + 2 * u)) < 1e6
