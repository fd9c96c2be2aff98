#!/usr/bin/env python
"""weights_day.py — the one-command path for the day real weights arrive.

The framework's diffusion guidance (SD-inpainting UNet/VAE/CLIP-text,
reference: DS_NeRF/guidance/sd_utils.py:69-74) and perceptual metrics
(LPIPS VGG16, FID InceptionV3, reference: DS_NeRF/evaluation.py:52-54) are
weight-compatible with their torch checkpoints but this image has zero
egress, so no real weights have ever been on disk. This tool makes parity
numbers a single invocation away the moment checkpoint files exist:

  # real weights on disk -> train config-5 -> render testset -> PSNR/LPIPS/FID
  python tools/weights_day.py run --sd_root /w/sd-inpainting \
      --lpips_weights /w/lpips_vgg.pt --inception_weights /w/pt_inception.pt \
      [--config configs/spinnerf_scene1_full.txt] [--n_iters 10001] [--expname ...]

  # no weights needed: synthesize random FULL-SCALE torch state dicts with the
  # exact HF/torchvision key names, then re-import them through the same gated
  # loaders `run` uses and verify the round trip bit-for-bit:
  python tools/weights_day.py dry --out /tmp/fake_weights [--keep]

`dry` runs on CPU (it must not touch a TPU that may be mid-training); `run`
uses the default backend (the real chip).

Each phase of `run` is skippable (--skip_train / --skip_render) so a crashed
session resumes where it left off; training auto-resumes from the expdir's
newest checkpoint like any run.py invocation.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _count(tree):
    import numpy as np

    n = 0
    for leaf in __import__("jax").tree.leaves(tree):
        n += int(np.asarray(leaf).size)
    return n


# --------------------------------------------------------------------------
# dry: synthesize full-scale random torch state dicts + round-trip the import


def _save_torch_sd(sd, path):
    import torch

    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, path)


def _export_lpips_sd(params, cfg):
    """Inverse of eval/lpips_jax.py import_lpips_state: torchvision vgg16
    `features.*` conv names + lpips `lin{i}.model.1` heads."""
    import numpy as np

    from mvip_tpu.eval.lpips_jax import lpips_mapping

    sd = {}
    for name, path, kind in lpips_mapping(cfg):
        node = params
        for p in path:
            node = node[p]
        if kind == "conv":
            sd[f"{name}.weight"] = np.ascontiguousarray(
                np.transpose(np.asarray(node["w"]), (3, 2, 0, 1)))
            sd[f"{name}.bias"] = np.asarray(node["b"])
        else:  # lin1x1: stored [C, 1], torch shape [1, C, 1, 1]
            w = np.asarray(node["w"])[:, 0]
            sd[f"{name}.weight"] = np.ascontiguousarray(w[None, :, None, None])
    return sd


def _export_inception_sd(params):
    """Inverse of eval/inception_jax.py import_inception_state (torchvision
    inception_v3 module names: <prefix>.conv.weight + <prefix>.bn.*)."""
    import numpy as np

    from mvip_tpu.eval.inception_jax import inception_mapping

    sd = {}
    for prefix, path in inception_mapping(params):
        node = params
        for p in path:
            node = node[p]
        sd[f"{prefix}.conv.weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(node["w"]), (3, 2, 0, 1)))
        sd[f"{prefix}.bn.weight"] = np.asarray(node["scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(node["bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(node["mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(node["var"])
    return sd


def _write_fake_tokenizer(outdir):
    """Minimal VALID byte-level CLIP tokenizer (vocab.json + merges.txt).

    The real SD tree ships a BPE tokenizer dir; this image has no vocab
    anywhere, so without one the weights-day `run` rehearsal would die at
    `guidance.clip.tokenize` before ever reaching the TPU. A byte-alphabet
    vocab (514 entries: bytes_to_unicode chars, their `</w>` forms, the two
    specials) with zero merges is a valid CLIPTokenizer input that tokenizes
    any prompt char-level; every id < 514 embeds fine in the 49408-row text
    encoder. Real weights day replaces the whole tree, tokenizer included."""
    bs = list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    alphabet = [chr(c) for c in cs]
    vocab = {}
    for ch in alphabet:
        vocab.setdefault(ch, len(vocab))
    for ch in alphabet:
        vocab.setdefault(ch + "</w>", len(vocab))
    for sp in ("<|startoftext|>", "<|endoftext|>"):
        vocab[sp] = len(vocab)
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "vocab.json"), "w") as fh:
        json.dump(vocab, fh)
    with open(os.path.join(outdir, "merges.txt"), "w") as fh:
        fh.write("#version: 0.2\n")
    with open(os.path.join(outdir, "tokenizer_config.json"), "w") as fh:
        json.dump({"model_max_length": 77}, fh)


def _tree_allclose(a, b, atol=0.0):
    import jax
    import numpy as np

    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb), (len(la), len(lb))
    worst = 0.0
    for x, y in zip(la, lb):
        worst = max(worst, float(np.max(np.abs(np.asarray(x) - np.asarray(y)))
                                 if np.asarray(x).size else 0.0))
    return worst


def cmd_dry(args):
    import jax

    jax.config.update("jax_platforms", "cpu")  # never touch a busy TPU
    import numpy as np

    from mvip_tpu.guidance.weights import (
        clip_text_mapping,
        export_state_dict,
        load_sd_guidance,
        sd15_inpaint_configs,
        unet_mapping,
        vae_mapping,
    )

    out = args.out
    report = {}

    # --- SD-inpainting tree (unet/ vae/ text_encoder/), full runwayml scale
    unet_cfg, vae_cfg, text_cfg = sd15_inpaint_configs()
    from mvip_tpu.guidance.clip import init_clip_text
    from mvip_tpu.guidance.unet import init_unet
    from mvip_tpu.guidance.vae import init_vae

    key = jax.random.PRNGKey(args.seed)
    print("[dry] initializing full-scale random params (1 CPU core — minutes)...")
    src = {}
    for name, init, cfg, mapping in (
        ("unet", init_unet, unet_cfg, unet_mapping(unet_cfg)),
        ("vae", init_vae, vae_cfg, vae_mapping(vae_cfg)),
        ("text_encoder", init_clip_text, text_cfg, clip_text_mapping(text_cfg)),
    ):
        params = jax.tree.map(np.asarray, init(key, cfg))
        src[name] = params
        sd = export_state_dict(params, mapping)
        _save_torch_sd(sd, os.path.join(out, "sd", name, "model.bin"))
        report[f"{name}_params"] = _count(params)
        report[f"{name}_sd_tensors"] = len(sd)
        print(f"[dry] wrote {name}: {report[f'{name}_params']:,} params, "
              f"{len(sd)} state-dict tensors")

    # --- LPIPS (VGG16 features + lin heads) and FID InceptionV3
    from mvip_tpu.eval.inception_jax import init_inception, load_inception_weights
    from mvip_tpu.eval.lpips_jax import LPIPSConfig, init_lpips, load_lpips_weights

    lp_cfg = LPIPSConfig()
    lp_src = jax.tree.map(np.asarray, init_lpips(key, lp_cfg))
    _save_torch_sd(_export_lpips_sd(lp_src, lp_cfg),
                   os.path.join(out, "lpips_vgg.pt"))
    report["lpips_params"] = _count(lp_src)

    inc_src = jax.tree.map(np.asarray, init_inception(key))
    _save_torch_sd(_export_inception_sd(inc_src),
                   os.path.join(out, "pt_inception.pt"))
    report["inception_params"] = _count(inc_src)
    print(f"[dry] wrote lpips ({report['lpips_params']:,}) + "
          f"inception ({report['inception_params']:,})")

    # --- tokenizer: the run rehearsal needs sd/tokenizer to exist (no CLIP
    # vocab ships in this image); see _write_fake_tokenizer
    _write_fake_tokenizer(os.path.join(out, "sd", "tokenizer"))
    from mvip_tpu.guidance.clip import tokenize

    ids = tokenize(["a stone park bench"],
                   os.path.join(out, "sd", "tokenizer"))
    report["tokenizer_ids_shape"] = list(ids.shape)
    print(f"[dry] wrote byte-level tokenizer (ids {ids.shape})")

    # --- round trip: re-import through the REAL gated loaders
    print("[dry] re-importing through load_sd_guidance/load_lpips_weights/"
          "load_inception_weights...")
    unet_p, vae_p, text_p, _ = load_sd_guidance(os.path.join(out, "sd"))
    report["roundtrip_unet_maxabs"] = _tree_allclose(unet_p, src["unet"])
    report["roundtrip_vae_maxabs"] = _tree_allclose(vae_p, src["vae"])
    report["roundtrip_text_maxabs"] = _tree_allclose(text_p, src["text_encoder"])

    lp_back = load_lpips_weights(os.path.join(out, "lpips_vgg.pt"), lp_cfg)
    report["roundtrip_lpips_maxabs"] = _tree_allclose(lp_back, lp_src)
    inc_back, _ = load_inception_weights(os.path.join(out, "pt_inception.pt"))
    report["roundtrip_inception_maxabs"] = _tree_allclose(inc_back, inc_src)

    failures = {k: v for k, v in report.items()
                if k.startswith("roundtrip") and v > 1e-6}
    report["ok"] = not failures
    print(json.dumps(report, indent=2))
    if failures:
        raise SystemExit(f"round-trip mismatches: {failures}")
    print(f"[dry] OK — import path verified at full scale. Tree at {out}"
          + ("" if args.keep else " (pass --keep to retain; ~4.3 GB)"))
    if not args.keep:
        import shutil

        shutil.rmtree(out)
    return report


# --------------------------------------------------------------------------
# run: the actual weights-day pipeline


def _sh(cmd, env=None):
    print("[run] $", " ".join(cmd))
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, cwd=REPO, env=e)
    if r.returncode != 0:
        raise SystemExit(f"command failed ({r.returncode}): {' '.join(cmd)}")


def cmd_run(args):
    import numpy as np

    expdir = os.path.join(args.basedir, args.expname)

    # Default the metric weights to the siblings of --sd_root (the layout
    # `dry` synthesizes, and the natural layout for real weight drops). The
    # r4 rehearsal ran without --inception_weights and the FID path silently
    # degraded to "n/a (no weights)" — the exact wiring gap VERDICT r4
    # missing #2 flagged. A configured-but-missing path is now a hard error
    # instead of a silent downgrade.
    wroot = os.path.dirname(os.path.abspath(args.sd_root))
    for attr, fname in (("lpips_weights", "lpips_vgg.pt"),
                       ("inception_weights", "pt_inception.pt")):
        if not getattr(args, attr):
            cand = os.path.join(wroot, fname)
            if os.path.exists(cand):
                print(f"[run] defaulting --{attr} to {cand}")
                setattr(args, attr, cand)
        elif not os.path.exists(getattr(args, attr)):
            raise SystemExit(
                f"--{attr} {getattr(args, attr)} does not exist — refusing "
                f"to run a weights-day rehearsal that would silently skip "
                f"its metric")

    # phase 0: verify every weight file imports before spending TPU time
    print("[run] phase 0: verifying weight imports (CPU)...")
    verify = [sys.executable, os.path.join(REPO, "tools", "weights_day.py"),
              "verify", "--sd_root", args.sd_root]
    if args.lpips_weights:
        verify += ["--lpips_weights", args.lpips_weights]
    if args.inception_weights:
        verify += ["--inception_weights", args.inception_weights]
    _sh(verify)

    # phase 1: train (auto-resumes if the expdir already has checkpoints).
    # megastep is forced to 1: real-scale UNets under megastep>1 multiply the
    # traced guidance graph and the XLA compile runs >25 min (ROADMAP r3
    # lesson) — config files shipping `megastep = 5` would hang here.
    if not args.skip_train:
        _sh([sys.executable, "run.py", "--config", args.config,
             "--expname", args.expname, "--basedir", args.basedir,
             "--sd_weights", args.sd_root, "--N_iters", str(args.n_iters),
             "--occ_grid", "true", "--i_weights", "500", "--ckpt_keep", "100",
             "--megastep", str(args.megastep),
             "--compute_dtype", args.compute_dtype])

    # phase 2: render the held-out testset from the final checkpoint
    if not args.skip_render:
        _sh([sys.executable, "run.py", "--config", args.config,
             "--expname", args.expname, "--basedir", args.basedir,
             "--render_only", "true", "--render_test", "true"])

    # phase 3: dump GT pngs + evaluate PSNR/LPIPS/FID (reference
    # evaluation.py:52-54 metric set) on the newest testset tree
    # phase 2 writes renderonly_test_<step>/ (the --render_only --render_test
    # tree); in-train i_testset renders write testset_<step>/ — accept both,
    # ranked by (step, renderonly-preferred): a plain lexicographic sort made
    # any stale in-train testset_* outrank the fresh renderonly_test_* tree
    # phase 2 just produced ('t' > 'r' — ADVICE r4)
    def _tree_rank(d):
        step = int(d.rsplit("_", 1)[-1]) if d.rsplit("_", 1)[-1].isdigit() else -1
        return (step, d.startswith("renderonly_test_"))

    testsets = sorted(
        (d for d in os.listdir(expdir)
         if d.startswith(("testset_", "renderonly_test_"))
         and os.path.isdir(os.path.join(expdir, d, "rgb"))),
        key=_tree_rank,
    )
    if not testsets:
        raise SystemExit(f"no testset_*/renderonly_test_* dir under {expdir}")
    pred = os.path.join(expdir, testsets[-1], "rgb")

    gt_dir = os.path.join(expdir, "gt_test")
    if not os.path.isdir(gt_dir) or not os.listdir(gt_dir):
        os.makedirs(gt_dir, exist_ok=True)
        import imageio.v2 as imageio

        from mvip_tpu.config import load_config
        from mvip_tpu.train.loop import load_scene

        cfg = load_config(["--config", args.config])
        test_images = load_scene(cfg)[-1]  # (..., test_poses, test_images)
        for i, img in enumerate(np.asarray(test_images)):
            imageio.imwrite(os.path.join(gt_dir, f"{i:03d}.png"),
                            (np.clip(img, 0, 1) * 255).astype(np.uint8))

    env = {}
    if args.inception_weights:
        env["MVIP_INCEPTION_WEIGHTS"] = args.inception_weights
    ev = [sys.executable, os.path.join("tools", "evaluate.py"),
          "--pred", pred, "--gt", gt_dir,
          "--out", os.path.join(expdir, "weights_day_eval.txt")]
    if args.lpips_weights:
        ev += ["--lpips_weights", args.lpips_weights]
    _sh(ev, env=env)
    print(f"[run] done — metrics in {expdir}/weights_day_eval.txt")


def cmd_verify(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mvip_tpu.guidance.weights import load_sd_guidance

    unet_p, vae_p, text_p, _ = load_sd_guidance(args.sd_root)
    print(f"[verify] SD import OK: unet {_count(unet_p):,} / "
          f"vae {_count(vae_p):,} / text {_count(text_p):,} params")
    if args.lpips_weights:
        from mvip_tpu.eval.lpips_jax import load_lpips_weights

        lp = load_lpips_weights(args.lpips_weights)
        print(f"[verify] LPIPS import OK: {_count(lp):,} params")
    if args.inception_weights:
        from mvip_tpu.eval.inception_jax import load_inception_weights

        inc, _ = load_inception_weights(args.inception_weights)
        print(f"[verify] Inception import OK: {_count(inc):,} params")


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dry", help="synthesize full-scale random state dicts "
                       "+ verify the import round trip (CPU)")
    d.add_argument("--out", default="/tmp/fake_weights")
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--keep", action="store_true",
                   help="keep the generated tree (for --sd_weights smokes)")
    d.set_defaults(fn=cmd_dry)

    v = sub.add_parser("verify", help="import real weight files, print counts")
    v.add_argument("--sd_root", required=True)
    v.add_argument("--lpips_weights", default="")
    v.add_argument("--inception_weights", default="")
    v.set_defaults(fn=cmd_verify)

    r = sub.add_parser("run", help="train config-5 with real weights, render "
                       "testset, emit PSNR/LPIPS/FID")
    r.add_argument("--sd_root", required=True,
                   help="diffusers checkpoint tree (unet/ vae/ text_encoder/)")
    r.add_argument("--lpips_weights", default="")
    r.add_argument("--inception_weights", default="")
    r.add_argument("--config", default="configs/spinnerf_scene1_full.txt")
    r.add_argument("--basedir", default="./logs_ours")
    r.add_argument("--expname", default="s1_weights_day")
    r.add_argument("--n_iters", type=int, default=10001)
    r.add_argument("--megastep", type=int, default=1,
                   help="steps per dispatch; keep 1 at real scale (compile "
                        "time scales with the traced UNet count)")
    r.add_argument("--skip_train", action="store_true")
    r.add_argument("--skip_render", action="store_true")
    r.add_argument("--compute_dtype", default="bfloat16",
                   help="VAE-encode conv dtype. bfloat16 is the default "
                        "because (a) the reference pipe runs fp16 "
                        "(sd_utils.py fp16 UNet/VAE) and (b) the f32 "
                        "batch-Nv colla VAE-encode VJP does not fit v5e "
                        "16 GB HBM at 512^2 (measured r4, BASELINE.md)")
    r.set_defaults(fn=cmd_run)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
