"""Experiment configuration.

Replaces the reference's configargparse flag soup (`DS_NeRF/run.py:52-306`) with a
typed dataclass. Field names deliberately match the reference flags so the shipped
config files (`DS_NeRF/config/config_1.txt`) parse unchanged: `key = value` lines,
precedence CLI > config file > defaults.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class Config:
    # --- experiment / io (run.py:56-66) ---
    config: Optional[str] = None
    expname: str = "exp"
    basedir: str = "./logs"
    datadir: str = "./data/1"

    # --- network arch (run.py:68-78) ---
    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256
    no_tcnn: bool = False          # False => hash-grid backbone (reference default)

    # --- ray batching / chunking (run.py:79-86) ---
    N_rand: int = 1024             # rays per gradient step
    lrate: float = 5e-4
    lrate_decay: int = 250         # lr decays 0.1 every lrate_decay*1000 steps
    chunk: int = 1024 * 32         # rays processed per render chunk
    netchunk: int = 1024 * 64      # points per network chunk (unused on TPU: fused)
    no_batching: bool = False
    no_reload: bool = False
    ft_path: Optional[str] = None

    # --- rendering (run.py:100-140) ---
    N_samples: int = 64
    N_importance: int = 0
    perturb: float = 1.0
    use_viewdirs: bool = True
    i_embed: int = 0               # 0: positional encoding, -1: identity
    multires: int = 10
    multires_views: int = 4
    raw_noise_std: float = 0.0
    render_only: bool = False
    render_test: bool = False
    render_test_ray: bool = False
    render_train: bool = False
    render_mypath: bool = False
    render_factor: int = 0
    seed: int = 0

    # --- dataset (run.py:143-170) ---
    dataset_type: str = "llff"     # llff | blender | dtu | nerd
    testskip: int = 8
    white_bkgd: bool = False
    half_res: bool = False
    factor: int = 8
    no_ndc: bool = False
    lindisp: bool = False
    spherify: bool = False
    llffhold: int = 0
    train_scene: Optional[List[int]] = None
    test_scene: Optional[List[int]] = None
    N_gt: int = 0
    N_train: Optional[int] = None
    train_gt: bool = False
    prepare: bool = False
    object_removal: bool = False

    # --- depth supervision (run.py:183-200) ---
    colmap_depth: bool = False
    depth_loss: bool = False
    depth_lambda: float = 0.1
    sigma_loss: bool = False
    sigma_lambda: float = 0.1
    weighted_loss: bool = False
    relative_loss: bool = False
    no_coarse: bool = False

    # --- guidance / SDS (run.py:210-260; nerf/utils.py) ---
    text: Optional[str] = None
    text_depth: Optional[str] = None
    text_normal: Optional[str] = None
    negative: str = ""
    guidance: str = "SD"           # 'SD' and/or 'clip' (comma separated)
    is_rgb_guidance: bool = False
    rgb_guidance_scale: float = 7.5
    is_normal_guidance: bool = False
    normal_guidance_scale: float = 1.5
    normal_start: int = 500
    is_colla_guidance: bool = False
    colla_guidance_scale: float = 7.5
    is_crop: bool = False
    sds_loss: bool = False
    sds_loss_weight: float = 1e-4
    sd_version: str = "inpaint"    # stable-diffusion inpainting checkpoint family
    fp16: bool = True              # bf16 on TPU
    normalmap_render_factor: int = 7
    # render the RGB-SDS masked view at (H//f, W//f) instead of full res; the
    # SDS input is resized to 512^2 either way, so f=2 cuts the guidance
    # step's dominant ray count ~4x with near-identical SDS input (TPU-first
    # throughput knob; 1 = reference-exact full-res masked render)
    sds_render_factor: int = 1
    # render the normal-map view and the colla neighbor views in ONE fused
    # dispatch: both are small (H//7, H//8-scale) full-view grids far below
    # chip saturation, so concatenating their ray sets keeps the megakernel
    # at its large-batch rate and drops one launch chain per step. Per-ray
    # rendering is independent — only the stochastic sample draws regroup
    # (one PRNG stream instead of two), so trajectories match statistically
    # but not bit-for-bit; off = reference-exact two-dispatch structure.
    fuse_guidance_renders: bool = False
    # orbit-pose sampling ranges (nerf/utils.py rand_poses defaults)
    radius_range: List[float] = field(default_factory=lambda: [1.0, 1.5])
    theta_range: List[float] = field(default_factory=lambda: [45.0, 105.0])
    phi_range: List[float] = field(default_factory=lambda: [-180.0, 180.0])
    angle_overhead: float = 30.0
    angle_front: float = 60.0
    uniform_sphere_rate: float = 0.5
    default_azimuth: float = 0.0
    default_polar: float = 90.0
    default_radius: float = 1.2
    lambda_guidance: float = 1.0
    progressive_view: bool = False
    progressive_view_init_ratio: float = 0.2
    progressive_level: bool = False
    exp_start_iter: int = 0
    exp_end_iter: int = 10000
    # perp-neg directional prompting (nerf/utils.py:34-74)
    front_decay_factor: float = 2.0
    side_decay_factor: float = 2.0
    negative_w: float = -2.0
    # local checkpoint dirs for guidance weights (zero-egress environment)
    sd_weights: Optional[str] = None     # dir with SD-inpainting unet/vae/text .safetensors
    clip_weights: Optional[str] = None
    # random-init guidance stack size when no sd_weights is given:
    # 'tiny' = unit-test-scale stack (pipeline smoke), 'real' = the full
    # SD-1.5 inpaint architecture (859.6M UNet / 83.7M VAE, 512px) with
    # random weights — proves the production-scale TRAINING step fits
    # memory and sustains the predicted guidance cost without a checkpoint.
    sd_size: str = "tiny"

    # --- training loop (run.py:262-306) ---
    N_iters: int = 10000
    first_stage: bool = False
    second_stage: bool = True
    i_print: int = 100
    i_img: int = 500
    i_weights: int = 10000
    i_testset: int = 2000
    i_video: int = 50000
    i_feat: int = 1000000
    feat_weight: float = 0.1
    lpips: bool = False
    debug: bool = False

    # --- TPU-native additions (not in reference) ---
    backbone: str = ""                       # "" = reference rule (no_tcnn ? mlp : hashgrid);
                                             # explicit: mlp | hashgrid | hashgrid_fused | triplane
    hashgrid_log2: int = 0                   # hash-table log2 size; 0 = backbone default
                                             # (19 tcnn-parity; 15 for hashgrid_fused — the
                                             # fused-MXU encode needs <= 16)
    hashgrid_fused_dtype: str = "float32"    # fused encode matmul dtype (bfloat16 = tcnn-fp16-like)
    mlp_fused_dtype: str = "float32"         # fused MLP train-kernel matmul/activation dtype
                                             # (bfloat16 = tcnn-fp16-like, f32 accumulate)
    hashgrid_encode: str = "auto"            # fused encode algorithm: auto | gen2 | sorted
                                             # (sorted = T-independent sorted-slab gather,
                                             # engages at log2 >= 17 under auto)
    mesh_shape: Optional[List[int]] = None   # data-parallel mesh; None = all devices
    param_dtype: str = "float32"
    compute_dtype: str = "float32"           # bfloat16 for max MXU throughput
    use_pallas: bool = True                  # Pallas kernels on TPU hot paths
    megastep: int = 1                        # lax.scan this many train steps per
                                             # dispatch (amortizes tunnel/host dispatch
                                             # latency; works for guidance-off AND the
                                             # full SDS step). N_iters and the
                                             # print/ckpt/render cadences round UP to
                                             # whole dispatches; logs/artifacts are
                                             # labeled with the last completed step
    max_masked_pixels: int = 0               # 0 = auto (max over train views, padded)
    ckpt_keep: int = 5                       # orbax max_to_keep; raise for
                                             # checkpoint-chained cross-session
                                             # runs so rotation can't delete a
                                             # committed resume base (ADVICE r2)
    # Occupancy-grid sample pruning (ops/occupancy.py) — opt-in instant-NGP
    # style accelerator with NO reference counterpart: each render stage keeps
    # occ_keep of its samples, chosen by an EMA density grid. Supported
    # everywhere: the guidance-off XLA-step paths (both modes) and — interval
    # mode, via the phantom-sample ladder trick — the fused-Pallas guidance-off
    # MLP step and the guidance-on MVIP step, where every render (masked view,
    # normal view, collaborative neighbors, base batches, fused Pallas or XLA)
    # prunes. Warmup steps run unpruned while the grid fills.
    occ_grid: bool = False
    occ_res: int = 128                       # grid resolution per axis
    occ_bound: float = 0.0                   # grid AABB half-extent; 0 = auto
                                             # (fit the ray span: |pose|+far,
                                             # capped by the model bound) —
                                             # the encode bound (e.g. 100) is
                                             # far too coarse for LLFF scenes
                                             # whose rays span a few units
    occ_keep: float = 0.5                    # fraction of samples kept per stage
    # Separate (tighter) keep rate for the GUIDANCE renders only (masked-view
    # RGB, normal-map view, collaborative neighbors). Those renders feed SDS:
    # their output is resized to the diffusion working resolution and noised
    # to a random timestep before the score is taken, so they tolerate coarser
    # ray quadrature than the reconstruction losses — and at ~136k rays/step
    # on config-5 (vs N_rand=1024 base rays) they are >98% of the step's
    # sample load, all running at the encode roofline (~0.33 us/point,
    # BASELINE.md phase budget). 0 = inherit occ_keep (shipped default); base
    # losses always use occ_keep, so reference-exact quadrature is unchanged.
    occ_keep_guidance: float = 0.0
    occ_thresh: float = 1e-2                 # density above which a cell is occupied
    occ_update_every: int = 16               # refresh cadence (optimizer steps)
    occ_warmup: int = 256                    # unpruned steps while the grid fills
    occ_mode: str = "interval"               # interval = redistribute samples
                                             # into the occupied span (NGP-style
                                             # march-in-occupied-space);
                                             # topk = keep a subset of original
                                             # strata (exact quadrature, lower
                                             # in-content resolution)
    gui: bool = False                        # reference spawns tkinter unconditionally
    profile_dir: Optional[str] = None        # jax.profiler trace output
    log_every: int = 100
    # Multi-host (multi-process) launch — `jax.distributed.initialize` wiring
    # (SURVEY §2.3: DCN scale-out runs the SAME program; the reference has no
    # multi-process story at all). All processes run every dispatch (SPMD);
    # process 0 owns the artifact writes. No-op at num_processes=1.
    coordinator: Optional[str] = None        # "host:port" of process 0
    num_processes: int = 1
    process_id: Optional[int] = None

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_BOOL_TRUE = {"true", "1", "yes", "on"}
_BOOL_FALSE = {"false", "0", "no", "off", "none"}


def _coerce(name: str, raw: str, ftype):
    raw = raw.strip()
    origin = getattr(ftype, "__origin__", None)
    if ftype is bool:
        low = raw.lower()
        if low in _BOOL_TRUE:
            return True
        if low in _BOOL_FALSE:
            return False
        raise ValueError(f"config field {name!r}: cannot parse bool from {raw!r}")
    if ftype is int:
        return int(raw)
    if ftype is float:
        return float(raw)
    if ftype is str:
        return raw
    # Optional[X] → X (or None)
    if origin is not None and origin.__name__ == "Union" or str(ftype).startswith("typing.Optional"):
        args = [a for a in ftype.__args__ if a is not type(None)]
        if raw in ("None", "none"):  # reference guards `ft_path != 'None'`
            return None
        # falsy words mean "unset" for optional non-string fields, but keep
        # NUMERIC tokens literal: Optional[int] "--process_id 0" must be 0
        if (raw.lower() in _BOOL_FALSE and args[0] is not str
                and not raw.lstrip("+-").isdigit()):
            return None
        return _coerce(name, raw, args[0])
    if origin in (list, List) or str(ftype).startswith("typing.List"):
        elem = ftype.__args__[0]
        raw = raw.strip("[]")
        return [_coerce(name, tok, elem) for tok in raw.replace(",", " ").split()]
    raise ValueError(f"config field {name!r}: unsupported type {ftype}")


def parse_config_file(path: str) -> dict:
    """Parse a reference-style `key = value` config file (config_1.txt format)."""
    fields = {f.name: f.type for f in dataclasses.fields(Config)}
    # dataclass stores string annotations under `from __future__ import annotations`
    import typing

    hints = typing.get_type_hints(Config)
    out = {}
    with open(path) as fh:
        for lineno, line in enumerate(fh, 1):
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=" not in line:
                raise ValueError(f"{path}:{lineno}: expected 'key = value', got {line!r}")
            key, val = (tok.strip() for tok in line.split("=", 1))
            if key not in fields:
                # unknown reference flags are warned about, not fatal
                print(f"WARNING: {path}:{lineno}: unknown config key {key!r} ignored")
                continue
            out[key] = _coerce(key, val, hints[key])
    return out


def load_config(argv: Optional[List[str]] = None) -> Config:
    """CLI entry: `--config file.txt` plus `--<field> value` overrides."""
    import typing

    hints = typing.get_type_hints(Config)
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", type=str, default=None)
    known, _ = pre.parse_known_args(argv)

    values = {}
    if known.config:
        values.update(parse_config_file(known.config))
        values["config"] = known.config

    parser = argparse.ArgumentParser("mvip_tpu")
    for f in dataclasses.fields(Config):
        if hints[f.name] is bool:
            # reference-style bare flags: `--render_only` == `--render_only true`
            parser.add_argument(f"--{f.name}", type=str, nargs="?", const="true",
                                default=None)
            # negation alias (`--no_occ_grid`): the escape hatch back to
            # reference-exact semantics now that TPU-first accelerators ship
            # ON in the canonical configs. An explicit `--<flag>` wins.
            parser.add_argument(f"--no_{f.name}", dest=f"no__{f.name}",
                                action="store_const", const="false", default=None)
        else:
            parser.add_argument(f"--{f.name}", type=str, default=None)
    ns = parser.parse_args(argv)
    for f in dataclasses.fields(Config):
        raw = getattr(ns, f.name)
        if raw is None and hints[f.name] is bool:
            raw = getattr(ns, f"no__{f.name}", None)
        if raw is not None and f.name != "config":
            values[f.name] = _coerce(f.name, raw, hints[f.name])
    return Config(**values)


def save_config(cfg: Config, expdir: str) -> None:
    """Write args.txt + config copy into the experiment dir (run.py:526-538 parity)."""
    os.makedirs(expdir, exist_ok=True)
    with open(os.path.join(expdir, "args.txt"), "w") as fh:
        for f in sorted(dataclasses.fields(Config), key=lambda f: f.name):
            fh.write(f"{f.name} = {getattr(cfg, f.name)}\n")
    if cfg.config and os.path.exists(cfg.config):
        with open(cfg.config) as src, open(os.path.join(expdir, "config.txt"), "w") as dst:
            dst.write(src.read())
