#!/usr/bin/env python
"""Held-out test-view evaluation straight from a training checkpoint.

Renders every test pose of the configured scene from the experiment's latest
checkpoint (same dispatch as `run.py --render_only --render_test`) and scores
PSNR/SSIM (+ LPIPS when weights are available) against the GT test images —
the quality measurement behind BASELINE.md's test-view tables (reference:
`DS_NeRF/evaluation.py:48-132`, which scores saved render trees the same way).

Usage: python tools/eval_testview.py --config configs/foo.txt [overrides...]
Prints one JSON line: {"expname", "step", "psnr", "ssim", "n_views"}.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    from mvip_tpu.config import load_config
    from mvip_tpu.eval.metrics import psnr, ssim
    from mvip_tpu.train.checkpoint import CheckpointManager
    from mvip_tpu.train.loop import (
        _render_pose_list_dispatch,
        setup_experiment,
    )
    from mvip_tpu.train.state import create_train_state, make_optimizer

    cfg = load_config(argv)
    exp = setup_experiment(cfg)
    expdir = os.path.join(cfg.basedir, cfg.expname)
    state = create_train_state(
        exp.init_params, make_optimizer(cfg.lrate, cfg.lrate_decay)
    )
    ckpt = CheckpointManager(os.path.join(expdir, "ckpt"))
    state = ckpt.restore(state)
    step = int(state.step)

    ropts = dataclasses.replace(exp.ropts, perturb=0.0, raw_noise_std=0.0)
    outs = _render_pose_list_dispatch(
        cfg, exp, state, exp.test_poses, ropts, render_factor=0, savedir=None
    )
    preds = np.clip(np.asarray(outs["rgb"]), 0.0, 1.0)
    gts = np.asarray(exp.test_images)

    psnrs = [float(psnr(p, g)) for p, g in zip(preds, gts)]
    ssims = [float(ssim(p, g)) for p, g in zip(preds, gts)]
    rec = {
        "expname": cfg.expname,
        "step": step,
        "psnr": round(float(np.mean(psnrs)), 3),
        "ssim": round(float(np.mean(ssims)), 4),
        "n_views": len(psnrs),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
