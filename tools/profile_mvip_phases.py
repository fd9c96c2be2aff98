#!/usr/bin/env python
"""Per-phase wall-time budget of the guidance-on MVIP step (VERDICT r3 next #4).

The config-5 step is ONE jitted program, so phases can't be timed inside it;
instead we time ABLATIONS: the full step, then the step with each guidance
phase disabled, on the real scene/config. phase_cost ~= t(full) - t(without),
which is exact up to XLA overlap between phases (reported as the residual).

Honest timing through the tunneled TPU (BASELINE.md "MEASUREMENT NOTE"):
each rep chains the PRNG key on a scalar fetched from the previous step's
metrics, so no two reps share inputs, and the loop closes with a host VALUE
fetch. Run on a QUIET host.

Usage:  python tools/profile_mvip_phases.py [--config configs/spinnerf_scene1_full.txt]
                                            [--iters 12] [--sds_render_factor 1]
Writes one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/spinnerf_scene1_full.txt")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--sds_render_factor", type=int, default=1)
    ap.add_argument("--fuse_guidance_renders", default="false")
    ap.add_argument("--occ_keep_guidance", default="0")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mvip_tpu.config import load_config
    from mvip_tpu.train import loop as L
    from mvip_tpu.train.guidance_setup import build_guidance
    from mvip_tpu.train.mvip_step import (
        fused_guidance_supported,
        make_mvip_train_step,
    )
    from mvip_tpu.train.state import create_train_state, make_optimizer
    from mvip_tpu.train.step import DeviceStreams

    cfg = load_config(["--config", args.config,
                       "--sds_render_factor", str(args.sds_render_factor),
                       "--fuse_guidance_renders", args.fuse_guidance_renders,
                       "--occ_keep_guidance", args.occ_keep_guidance,
                       "--megastep", "1"])
    exp = L.setup_experiment(cfg)
    occ_cfg = None
    if cfg.occ_grid:
        from mvip_tpu.ops.occupancy import (
            OccupancyConfig, dense_refresh, init_grid, sigma_fn_from_apply,
        )

        # same auto-bound logic as the trainer; use the trainer's helper if
        # exposed, else re-derive conservatively from the ray span
        import numpy as np

        cam = float(np.abs(np.asarray(exp.streams.poses)[:, :3, 3]).max())
        f = float(np.asarray(exp.scfg.focal).max())
        dmax = float(np.sqrt((exp.scfg.W / (2 * f)) ** 2
                             + (exp.scfg.H / (2 * f)) ** 2 + 1.0))
        bound = min(float(getattr(exp.model_cfg, "bound", 1e9)),
                    1.05 * (cam + float(exp.scfg.far) * dmax))
        occ_cfg = OccupancyConfig(res=cfg.occ_res, bound=bound,
                                  keep=cfg.occ_keep, thresh=cfg.occ_thresh,
                                  mode="interval")
        grid = dense_refresh(
            init_grid(occ_cfg),
            sigma_fn_from_apply(
                exp.fine_apply or exp.coarse_apply,
                exp.init_params["fine"] or exp.init_params["coarse"],
            ),
            jax.random.PRNGKey(7), occ_cfg, passes=4,
        )
    gm, mcfg0, (s_rgb, s_nrm, s_col), pair_rgb, pair_nrm = build_guidance(cfg)
    fused_mlp_cfg = (
        exp.model_cfg
        if cfg.use_pallas
        and fused_guidance_supported(exp.ropts, exp.backbone, exp.model_cfg)
        else None
    )
    optimizer = make_optimizer(cfg.lrate, cfg.lrate_decay)

    import dataclasses as dc

    variants = {
        "full": {},
        "no_rgb_sds": {"is_rgb_guidance": False},
        "no_normal_sds": {"is_normal_guidance": False},
        "no_colla_sds": {"is_colla_guidance": False},
        "base_only": {"is_rgb_guidance": False, "is_normal_guidance": False,
                      "is_colla_guidance": False},
    }
    streams_dev = DeviceStreams.from_host(exp.streams)
    key = jax.random.PRNGKey(0)
    times = {}
    for name, over in variants.items():
        mcfg = dc.replace(mcfg0, **over)
        step = make_mvip_train_step(
            exp.scfg, exp.ropts, exp.coarse_apply, exp.fine_apply, optimizer,
            mcfg, gm, s_rgb, s_nrm, s_col, pair_rgb, pair_nrm,
            fused_mlp_cfg=fused_mlp_cfg, occ_cfg=occ_cfg,
        )
        # fresh COPIES each variant: the step donates the state, so a second
        # variant built from the same init_params leaves would hit
        # donation-deleted arrays
        state = create_train_state(
            jax.tree.map(jnp.copy, exp.init_params), optimizer
        )
        occ_arg = (grid,) if occ_cfg is not None else ()
        s = jnp.zeros((), jnp.float32)
        for i in range(args.warmup):
            k = jax.random.fold_in(key, i)
            state, m = step(state, streams_dev, k, jnp.asarray(600 + i), *occ_arg)
        s = float(m["loss"])  # value fetch: warmup really finished
        t0 = time.perf_counter()
        for i in range(args.iters):
            # chain a fetched scalar into the key so every rep is a distinct
            # execution (tunnel memoizes identical dispatches)
            k = jax.random.fold_in(key, 100 + i + int(s * 1e6) % 7)
            state, m = step(state, streams_dev, k,
                            jnp.asarray(700 + i), *occ_arg)
            s = float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        times[name] = dt
        print(json.dumps({"variant": name, "sec_per_step": round(dt, 4),
                          "rays_per_sec_nrand": round(cfg.N_rand / dt, 1)}),
              flush=True)

    full = times["full"]
    budget = {
        "rgb_sds_phase_sec": round(full - times["no_rgb_sds"], 4),
        "normal_sds_phase_sec": round(full - times["no_normal_sds"], 4),
        "colla_sds_phase_sec": round(full - times["no_colla_sds"], 4),
        "base_losses_sec": round(times["base_only"], 4),
        "overlap_residual_sec": round(
            full
            - (full - times["no_rgb_sds"])
            - (full - times["no_normal_sds"])
            - (full - times["no_colla_sds"])
            - times["base_only"], 4,
        ),
        "full_sec_per_step": round(full, 4),
        "sds_render_factor": args.sds_render_factor,
        "occ_keep_guidance": args.occ_keep_guidance,
    }
    print(json.dumps(budget), flush=True)


if __name__ == "__main__":
    main()
