#!/usr/bin/env python
"""Offline evaluation harness: image quality + depth metrics over scene dirs.

Capability parity with `DS_NeRF/evaluation.py:48-132` (PSNR, LPIPS, FID per
scene; depth L1/L2; results appended to eval.txt), minus its hardcoded cluster
paths: scenes are passed on the command line as pred/gt directory pairs.

Metric backends in this zero-egress image: PSNR/SSIM run natively (JAX/numpy).
LPIPS and FID have NATIVE JAX extractors (eval/lpips_jax.py VGG16,
eval/inception_jax.py InceptionV3 — both torch-replica golden-tested) that
need only a local weights file: `--lpips_weights`/`MVIP_LPIPS_WEIGHTS` and
`MVIP_INCEPTION_WEIGHTS` (torchvision or pytorch-fid `pt_inception` state
dicts import unchanged). Without weights they are logged as n/a —
`mvip_tpu.eval.metrics.lpips_torch` / `fid` gate themselves.

Usage:
    python tools/evaluate.py --pred exp/testset/rgb --gt data/1/images_4 \\
        [--pred_depth exp/testset/depth --gt_depth data/1/depth] [--out eval.txt]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_dir(path):
    import imageio.v2 as imageio

    files = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    return [imageio.imread(os.path.join(path, f))[..., :3] / 255.0 for f in files], files


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pred", help="dir of predicted images")
    parser.add_argument("--gt", help="dir of ground-truth images")
    parser.add_argument(
        "--pairs", default=None,
        help="batch mode (the reference's 16-scene loop, evaluation.py:62-124): "
             "a text file with one 'pred_dir gt_dir' pair per line",
    )
    parser.add_argument("--pred_depth", default=None, help="dir of predicted depth .npy")
    parser.add_argument("--gt_depth", default=None, help="dir of gt depth .npy")
    parser.add_argument("--out", default="eval.txt")
    parser.add_argument("--lpips_net", default="vgg")
    parser.add_argument(
        "--lpips_weights",
        default=os.environ.get("MVIP_LPIPS_WEIGHTS", ""),
        help="torch state dict (VGG16 features + lpips lin heads) for the "
        "NATIVE JAX LPIPS (eval/lpips_jax.py); used when the torch lpips "
        "package is absent",
    )
    args = parser.parse_args()

    if args.pairs:
        with open(args.pairs) as fh:
            pairs = [l.split() for l in fh if l.strip() and not l.startswith("#")]
        for pred_dir, gt_dir in pairs:
            _evaluate_pair(pred_dir, gt_dir, args)
        return
    if not (args.pred and args.gt):
        parser.error("either --pairs or both --pred and --gt are required")
    _evaluate_pair(args.pred, args.gt, args)


def _evaluate_pair(pred_path, gt_path, args):
    from mvip_tpu.eval.metrics import depth_l1_l2, fid, lpips_torch, psnr, ssim

    preds, names = _load_dir(pred_path)
    gts, _ = _load_dir(gt_path)
    n = min(len(preds), len(gts))
    if len(preds) != len(gts):
        print(f"WARNING: {len(preds)} pred vs {len(gts)} gt images; using first {n}")

    lpips_native = None
    if getattr(args, "lpips_weights", "") and os.path.exists(args.lpips_weights):
        import jax.numpy as _jnp

        from mvip_tpu.eval.lpips_jax import LPIPSConfig, load_lpips_weights, lpips

        _lp_params = load_lpips_weights(args.lpips_weights)
        _lp_cfg = LPIPSConfig()

        def lpips_native(p, g):
            a = _jnp.asarray(p) * 2.0 - 1.0
            b = _jnp.asarray(g) * 2.0 - 1.0
            return float(lpips(_lp_params, _lp_cfg, a[None], b[None])[0])

    psnrs, ssims, lpipss = [], [], []
    for p, g in zip(preds[:n], gts[:n]):
        if p.shape != g.shape:
            import cv2

            g = cv2.resize(g, (p.shape[1], p.shape[0]))
        psnrs.append(float(psnr(np.asarray(p, np.float32), np.asarray(g, np.float32))))
        ssims.append(float(ssim(np.asarray(p, np.float32), np.asarray(g, np.float32))))
        if lpips_native is not None:
            lpipss.append(lpips_native(p.astype(np.float32), g.astype(np.float32)))
        else:
            lp = lpips_torch(p.astype(np.float32), g.astype(np.float32),
                             args.lpips_net)
            if lp is not None:
                lpipss.append(lp)

    fid_val, fid_reason = fid(
        np.stack(preds[:n]).astype(np.float32), np.stack(gts[:n]).astype(np.float32)
    )

    d_l1 = d_l2 = None
    if args.pred_depth and args.gt_depth:
        dp = sorted(os.listdir(args.pred_depth))
        dg = sorted(os.listdir(args.gt_depth))
        l1s, l2s = [], []
        for a, b in zip(dp, dg):
            da = np.load(os.path.join(args.pred_depth, a))
            db = np.load(os.path.join(args.gt_depth, b))
            l1, l2 = depth_l1_l2(da, db)
            l1s.append(l1)
            l2s.append(l2)
        d_l1, d_l2 = float(np.mean(l1s)), float(np.mean(l2s))

    lines = [
        f"pred={pred_path} gt={gt_path} n={n}",
        f"PSNR  {np.mean(psnrs):.4f}",
        f"SSIM  {np.mean(ssims):.4f}",
        f"LPIPS {np.mean(lpipss):.4f}" if lpipss else "LPIPS n/a (no weights)",
        f"FID   {fid_val:.4f}" if fid_val is not None
        else f"FID   n/a ({fid_reason})",
    ]
    if d_l1 is not None:
        lines += [f"depth L1 {d_l1:.5f}", f"depth L2 {d_l2:.5f}"]
    report = "\n".join(lines)
    print(report)
    with open(args.out, "a") as fh:
        fh.write(report + "\n\n")


if __name__ == "__main__":
    main()
