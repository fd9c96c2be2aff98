#!/usr/bin/env python
"""mvip_tpu CLI — entry point mirroring `DS_NeRF/run.py`'s config files.

Usage:
    python run.py --config configs/spinnerf_scene1.txt [--flag value ...]

Modes:
    default        train (second-stage MVIP-NeRF loop; guidance per config flags)
    --render_only  render the spiral path / test set from the latest checkpoint
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from functools import partial

import numpy as np

from mvip_tpu.config import load_config


def main(argv=None):
    cfg = load_config(argv)
    if cfg.num_processes > 1:
        # must precede the first jax backend use in this process
        from mvip_tpu.parallel.mesh import initialize_multihost

        initialize_multihost(cfg.coordinator, cfg.num_processes, cfg.process_id)
    if cfg.process_id in (None, 0):
        print(f"experiment {cfg.expname}: dataset={cfg.dataset_type} dir={cfg.datadir}")

    if cfg.render_test_ray:
        # sigma-along-ray probe (the reference's broken `--render_test_ray`
        # branch, `run.py:586-599` — see SURVEY.md §2.5; this one works)
        import jax
        import jax.numpy as jnp

        from mvip_tpu.eval.probes import render_test_ray
        from mvip_tpu.ops.rays import rays_for_pose
        from mvip_tpu.train.checkpoint import CheckpointManager
        from mvip_tpu.train.loop import setup_experiment
        from mvip_tpu.train.state import create_train_state, make_optimizer

        exp = setup_experiment(cfg)
        expdir = os.path.join(cfg.basedir, cfg.expname)
        state = create_train_state(
            exp.init_params, make_optimizer(cfg.lrate, cfg.lrate_decay)
        )
        ckpt = CheckpointManager(os.path.join(expdir, "ckpt"))
        if ckpt.latest_step() is not None:
            state = ckpt.restore(state)
        H, W, focal = exp.hwf
        c2w = jnp.asarray(exp.streams.poses[0])
        ro, rd = rays_for_pose(H, W, focal, c2w)
        center = (H // 2) * W + W // 2
        ro = ro.reshape(-1, 3)[center : center + 8]
        rd = rd.reshape(-1, 3)[center : center + 8]
        fn = partial(exp.coarse_apply, state.params["coarse"])
        out = render_test_ray(
            None, ro, rd, exp.near, exp.far, fn, cfg.N_samples,
            savedir=os.path.join(expdir, "testray"),
        )
        print(
            f"probed {out['sigma'].shape[0]} rays; "
            f"sigma max={out['sigma'].max():.4f} depth={out['depth'].mean():.3f}; "
            f"plots in {expdir}/testray"
        )
        return

    if cfg.render_only:
        import jax

        from mvip_tpu.train.checkpoint import CheckpointManager
        from mvip_tpu.train.loop import setup_experiment
        from mvip_tpu.train.state import create_train_state, make_optimizer
        from mvip_tpu.utils.imaging import save_video

        exp = setup_experiment(cfg)
        expdir = os.path.join(cfg.basedir, cfg.expname)
        state = create_train_state(
            exp.init_params, make_optimizer(cfg.lrate, cfg.lrate_decay)
        )
        if cfg.ft_path:
            from mvip_tpu.train.checkpoint import restore_from_path

            state = restore_from_path(cfg.ft_path, state)
        else:
            ckpt = CheckpointManager(os.path.join(expdir, "ckpt"))
            state = ckpt.restore(state)
        step = int(state.step)
        print(f"rendering from checkpoint step {step}")

        H, W, focal = exp.hwf
        import dataclasses

        # pose-source selection (reference `run.py:552-599` render modes):
        # --render_test  -> held-out test poses     --render_train -> train poses
        # --render_mypath-> standalone spiral path  default        -> scene spiral
        if cfg.render_test:
            poses, tag = exp.test_poses, "test"
        elif cfg.render_train:
            # streams hold the TRAIN subset already (test views are excluded)
            poses, tag = exp.streams.poses, "train"
        elif cfg.render_mypath:
            from mvip_tpu.eval.render_path import generate_render_path

            poses, tag = generate_render_path(exp.streams.poses, focal), "mypath"
        else:
            poses, tag = exp.render_poses, "path"

        savedir = os.path.join(expdir, f"renderonly_{tag}_{step:06d}")
        ropts = dataclasses.replace(exp.ropts, perturb=0.0, raw_noise_std=0.0)
        from mvip_tpu.train.loop import _render_pose_list_dispatch

        # fused Pallas path on TPU+MLP, XLA elsewhere (same dispatch as the
        # in-training video/testset renders)
        outs = _render_pose_list_dispatch(
            cfg, exp, state, poses, ropts, cfg.render_factor, savedir=savedir
        )
        save_video(os.path.join(savedir, "rgb.mp4"), outs["rgb"])
        disp = outs["disp"]
        disp[np.isnan(disp)] = 0
        save_video(
            os.path.join(savedir, "disp.mp4"), disp / max(np.percentile(disp, 95), 1e-8)
        )
        print("done rendering to", savedir)
        return

    from mvip_tpu.train.loop import train

    train(cfg)


if __name__ == "__main__":
    main()
