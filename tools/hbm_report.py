#!/usr/bin/env python
"""AOT peak-HBM report for the configured guidance train step (VERDICT r3 #5).

The axon-tunneled TPU backend does not expose runtime
`device.memory_stats()` (loop.py logs `hbm_peak_gb: null` there), so memory
evidence for real-scale runs comes from the compiler instead: AOT-lower and
compile the exact jitted MVIP step program, then print
`compiled.memory_analysis()` — XLA's actual buffer assignment for the
program (argument / output / temp / generated-code bytes and the implied
peak HBM). This is the same accounting the runtime allocator enforces, so
"fits in 16 GB v5e HBM" is decidable from it without a live step.

Reference capability this evidences: training with the real 860M-param SD
inpaint stack resident (the reference assumes a 24 GB GPU for
`DS_NeRF/guidance/sd_utils.py:69-74`).

Usage:
    python tools/hbm_report.py --config configs/spinnerf_scene1.txt \
        [--sd_size real] [any run.py overrides...]

Prints one JSON line. Compile at real scale takes minutes — run on a quiet
host and budget for it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from mvip_tpu.config import load_config
    from mvip_tpu.train import loop as L
    from mvip_tpu.train.guidance_setup import build_guidance, needs_guidance
    from mvip_tpu.train.mvip_step import (
        fused_guidance_supported,
        make_mvip_train_step,
    )
    from mvip_tpu.train.state import create_train_state, make_optimizer
    from mvip_tpu.train.step import DeviceStreams

    cfg = load_config(argv)
    if not (needs_guidance(cfg) and cfg.second_stage):
        raise SystemExit("hbm_report: config has no guidance phase — the "
                         "plain-fit step's memory is not the risk this tool "
                         "evidences")
    exp = L.setup_experiment(cfg)

    occ_cfg = None
    grid = None
    if cfg.occ_grid:
        import numpy as np

        from mvip_tpu.ops.occupancy import OccupancyConfig, init_grid

        cam = float(np.abs(np.asarray(exp.streams.poses)[:, :3, 3]).max())
        f = float(np.asarray(exp.scfg.focal).max())
        dmax = float(np.sqrt((exp.scfg.W / (2 * f)) ** 2
                             + (exp.scfg.H / (2 * f)) ** 2 + 1.0))
        bound = min(float(getattr(exp.model_cfg, "bound", 1e9)),
                    1.05 * (cam + float(exp.scfg.far) * dmax))
        occ_cfg = OccupancyConfig(res=cfg.occ_res, bound=bound,
                                  keep=cfg.occ_keep, thresh=cfg.occ_thresh,
                                  mode="interval")
        # grid VALUES don't matter for buffer assignment — shapes do
        grid = init_grid(occ_cfg)

    gm, mcfg, (s_rgb, s_nrm, s_col), pair_rgb, pair_nrm = build_guidance(cfg)
    fused_mlp_cfg = (
        exp.model_cfg
        if cfg.use_pallas
        and fused_guidance_supported(exp.ropts, exp.backbone, exp.model_cfg)
        else None
    )
    optimizer = make_optimizer(cfg.lrate, cfg.lrate_decay)
    n_inner = max(int(cfg.megastep), 1)
    step = make_mvip_train_step(
        exp.scfg, exp.ropts, exp.coarse_apply, exp.fine_apply, optimizer,
        mcfg, gm, s_rgb, s_nrm, s_col, pair_rgb, pair_nrm,
        fused_mlp_cfg=fused_mlp_cfg, occ_cfg=occ_cfg, n_inner=n_inner,
    )
    state = create_train_state(exp.init_params, optimizer)
    streams_dev = DeviceStreams.from_host(exp.streams)
    key = jax.random.PRNGKey(0)

    # Lower the trainer's OWN inner jitted program (step.jitted) with the
    # guidance arrays as ARGUMENTS. Wrapping `step` in an outer jit instead
    # would trace through it and re-bake the arrays as constants of the
    # outer program — at real scale that re-creates the 3.58 GB
    # baked-constants defect this report exists to rule out, and the outer
    # program would not share the compile cache with run.py's dispatch.
    occ_arg = grid if occ_cfg is not None else None
    args = (state, streams_dev, key, jnp.asarray(700), occ_arg,
            step.gm_arrays)

    t0 = time.perf_counter()
    lowered = step.jitted.lower(*args)
    t_lower = time.perf_counter() - t0
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0 - t_lower
    ma = compiled.memory_analysis()

    gb = 1024 ** 3
    arg_b = int(getattr(ma, "argument_size_in_bytes", 0))
    out_b = int(getattr(ma, "output_size_in_bytes", 0))
    alias_b = int(getattr(ma, "alias_size_in_bytes", 0))
    temp_b = int(getattr(ma, "temp_size_in_bytes", 0))
    code_b = int(getattr(ma, "generated_code_size_in_bytes", 0))
    peak_b = arg_b + out_b - alias_b + temp_b + code_b
    n_guid = sum(int(x.size) for x in
                 jax.tree.leaves((gm.unet_params, gm.vae_params)))
    rec = {
        "config": cfg.config,
        "sd_size": cfg.sd_size,
        "backbone": cfg.backbone,
        "megastep": n_inner,
        "guidance_params": int(n_guid),
        "argument_gb": round(arg_b / gb, 3),
        "output_gb": round(out_b / gb, 3),
        "alias_gb": round(alias_b / gb, 3),
        "temp_gb": round(temp_b / gb, 3),
        "code_gb": round(code_b / gb, 4),
        "peak_hbm_gb": round(peak_b / gb, 3),
        "fits_v5e_16gb": bool(peak_b < 16 * gb),
        "lower_sec": round(t_lower, 1),
        "compile_sec": round(t_compile, 1),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
