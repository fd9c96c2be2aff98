"""StepTimer async-honesty semantics + MFU accounting (VERDICT r2 weak #1:
an unsynced window close measured dispatch, not execution, and overstated
committed rays/s by 420x)."""

import time

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
