#!/usr/bin/env python
"""Export a trained mvip_tpu MLP fit as a reference-loadable torch `.tar`.

The output drops into the reference's expdir and `create_nerf` resumes from it
unchanged (`DS_NeRF/run.py:1647-1670`): `module.`-prefixed state dicts for the
DataParallel-wrapped nets, `global_step`, and a fresh torch-Adam group.

Usage:
    python tools/export_reference_ckpt.py --config configs/foo.txt \
        [--expname NAME] [--out path/to/010000.tar]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from mvip_tpu.config import load_config
    from mvip_tpu.interop.torch_ckpt import export_reference_checkpoint
    from mvip_tpu.models.nerf_mlp import NeRFMLPConfig
    from mvip_tpu.train.checkpoint import CheckpointManager
    from mvip_tpu.train.loop import setup_experiment
    from mvip_tpu.train.state import create_train_state, make_optimizer

    argv = list(sys.argv[1:] if argv is None else argv)
    out = None
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        del argv[i:i + 2]

    cfg = load_config(argv)
    if cfg.backbone != "mlp":
        raise SystemExit(
            f"backbone={cfg.backbone}: the reference .tar format holds the "
            "PE-MLP NeRF only — export requires --backbone mlp"
        )
    exp = setup_experiment(cfg)
    expdir = os.path.join(cfg.basedir, cfg.expname)
    state = create_train_state(
        exp.init_params, make_optimizer(cfg.lrate, cfg.lrate_decay)
    )
    ckpt = CheckpointManager(os.path.join(expdir, "ckpt"))
    state = ckpt.restore(state)
    step = int(state.step)

    mcfg = NeRFMLPConfig(
        depth=cfg.netdepth, width=cfg.netwidth, use_viewdirs=cfg.use_viewdirs,
        multires=cfg.multires, multires_views=cfg.multires_views,
    )
    fcfg = NeRFMLPConfig(
        depth=cfg.netdepth_fine, width=cfg.netwidth_fine,
        use_viewdirs=cfg.use_viewdirs,
        multires=cfg.multires, multires_views=cfg.multires_views,
    )
    out = out or os.path.join(expdir, f"{step:06d}.tar")
    export_reference_checkpoint(state.params, mcfg, step, out, lrate=cfg.lrate,
                                fine_cfg=fcfg)
    print(f"wrote {out} (step {step})")


if __name__ == "__main__":
    main()
