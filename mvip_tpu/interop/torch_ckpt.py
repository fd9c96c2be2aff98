"""Reference-checkpoint interop: import/export DS-NeRF `.tar` torch checkpoints.

The reference trains the PE-MLP NeRF (`DS_NeRF/run_nerf_helpers.py:74-156`)
and checkpoints `{global_step, network_fn_state_dict, network_fine_state_dict,
optimizer_state_dict}` as a torch `.tar` (`DS_NeRF/run.py:1043-1053`). A user
switching frameworks brings those files along; this module converts them to
and from our pytree params so existing fits can be rendered, evaluated, or
fine-tuned here (`--ft_path ckpt.tar`), and our fits can be handed back to the
reference (`export_reference_checkpoint` emits `module.`-prefixed state dicts,
matching the reference's DataParallel-wrapped save, `DS_NeRF/run.py:1491`).

Two representation differences are bridged:

  * weight layout — torch `nn.Linear` stores `[out, in]`; we store `[in, out]`
    (activations-row-major for the MXU). Transposed on the way through.
  * positional-encoding band order — the reference interleaves
    `[x | sin f0 | cos f0 | sin f1 | ...]` per band
    (`DS_NeRF/run_nerf_helpers.py:47-50`); our default is the TPU-fast grouped
    order `[x | sin f0..fL | cos f0..fL]` (`ops/embed.py`). The two differ by
    a fixed permutation of the encoded channels, so every weight ROW that
    consumes an embedded input (layer 0, the post-skip layers' first
    `input_ch` rows, the view branch's trailing `input_ch_views` rows) is
    permuted accordingly. Everything is inferred from the state dict's shapes;
    no config needs to accompany the file.

torch is imported lazily (CPU-only here; conversion is a host-side operation).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from mvip_tpu.models.nerf_mlp import NeRFMLPConfig


def band_permutation(num_freqs: int, d: int = 3, include_input: bool = True) -> np.ndarray:
    """perm[g] = reference (interleaved) channel index of grouped channel g.

    grouped:     [x(d) | sin f0 (d) .. sin fL (d) | cos f0 (d) .. cos fL (d)]
    interleaved: [x(d) | sin f0 (d) | cos f0 (d) | sin f1 (d) | ...]
    """
    base = d if include_input else 0
    perm = list(range(base))
    for trig in (0, 1):  # 0 = sin block, 1 = cos block
        for j in range(num_freqs):
            for dd in range(d):
                perm.append(base + j * 2 * d + trig * d + dd)
    return np.asarray(perm, np.int64)


def _strip_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Drop DataParallel's 'module.' prefix if present (reference wraps its
    nets, `DS_NeRF/run.py:1491,1527`, so saved keys carry the prefix)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return dict(sd)


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def infer_mlp_config(sd: Dict[str, Any]) -> NeRFMLPConfig:
    """Recover NeRFMLPConfig from a reference NeRF state dict's shapes."""
    sd = _strip_prefix(sd)
    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("pts_linears.")
    )
    w0 = _np(sd["pts_linears.0.weight"])          # [W, input_ch]
    width, input_ch = int(w0.shape[0]), int(w0.shape[1])
    if input_ch % 3 or (input_ch // 3 - 1) % 2:
        raise ValueError(f"cannot infer multires from input_ch={input_ch}")
    multires = (input_ch // 3 - 1) // 2
    skips = tuple(
        i - 1
        for i in range(1, depth)
        if _np(sd[f"pts_linears.{i}.weight"]).shape[1] == width + input_ch
    )
    use_viewdirs = "views_linears.0.weight" in sd
    if use_viewdirs:
        wv = _np(sd["views_linears.0.weight"])    # [W/2, W + input_ch_views]
        input_ch_views = int(wv.shape[1]) - width
        if input_ch_views % 3 or (input_ch_views // 3 - 1) % 2:
            raise ValueError(
                f"cannot infer multires_views from input_ch_views={input_ch_views}"
            )
        multires_views = (input_ch_views // 3 - 1) // 2
        output_ch = 4
    else:
        multires_views = 0
        output_ch = int(_np(sd["output_linear.weight"]).shape[0])
    return NeRFMLPConfig(
        depth=depth, width=width, skips=skips, use_viewdirs=use_viewdirs,
        multires=multires, multires_views=multires_views, output_ch=output_ch,
    )


def _lin_in(sd: Dict[str, Any], name: str, row_perm: Optional[np.ndarray] = None):
    """torch Linear -> our {'w': [in, out], 'b': [out]}, with an optional
    permutation of the INPUT rows (applied in torch's input indexing)."""
    w = _np(sd[f"{name}.weight"]).T               # [in, out]
    if row_perm is not None:
        w = w[row_perm]
    return {"w": w, "b": _np(sd[f"{name}.bias"])}


def import_nerf_state_dict(
    sd: Dict[str, Any], cfg: Optional[NeRFMLPConfig] = None
) -> Tuple[Dict[str, Any], NeRFMLPConfig]:
    """Reference NeRF state dict -> (our params pytree, inferred config)."""
    sd = _strip_prefix(sd)
    cfg = cfg or infer_mlp_config(sd)
    C, Cv, W = cfg.input_ch, cfg.input_ch_views, cfg.width
    pos_perm = band_permutation(cfg.multires)
    # post-skip layers: input = concat([embedded x, h]) in both frameworks
    # (`DS_NeRF/run_nerf_helpers.py:104` vs models/nerf_mlp.py) — permute the
    # first input_ch rows, identity on the hidden rows
    skip_perm = np.concatenate([pos_perm, C + np.arange(W)])
    params: Dict[str, Any] = {"pts": []}
    for i in range(cfg.depth):
        perm = pos_perm if i == 0 else (
            skip_perm if (i - 1) in cfg.skips else None
        )
        params["pts"].append(_lin_in(sd, f"pts_linears.{i}", perm))
    if cfg.use_viewdirs:
        params["feature"] = _lin_in(sd, "feature_linear")
        params["alpha"] = _lin_in(sd, "alpha_linear")
        # view branch input = concat([feature, embedded viewdir]) in both
        # (`run_nerf_helpers.py:131` order); permute the trailing rows
        view_perm = np.concatenate([np.arange(W), W + band_permutation(cfg.multires_views)])
        params["views"] = _lin_in(sd, "views_linears.0", view_perm)
        params["rgb"] = _lin_in(sd, "rgb_linear")
    else:
        params["output"] = _lin_in(sd, "output_linear")
    return params, cfg


def export_nerf_state_dict(
    params: Dict[str, Any], cfg: NeRFMLPConfig, prefix: str = "module."
) -> Dict[str, Any]:
    """Our params pytree -> reference NeRF state dict (torch tensors).

    `prefix='module.'` matches the reference's DataParallel-wrapped
    `state_dict()` so `model.load_state_dict(...)` works unmodified there."""
    import torch

    C, Cv, W = cfg.input_ch, cfg.input_ch_views, cfg.width
    w0 = np.asarray(params["pts"][0]["w"])
    if w0.shape != (C, W):
        raise ValueError(
            f"params (layer-0 weight {w0.shape}) do not match cfg {cfg} "
            f"(expected ({C}, {W})) — pass the config the net was built with "
            "(coarse and fine may differ: netdepth_fine/netwidth_fine)"
        )
    inv_pos = np.argsort(band_permutation(cfg.multires))
    inv_skip = np.concatenate([inv_pos, C + np.arange(W)])

    def lin_out(p, row_perm=None):
        w = np.asarray(p["w"], np.float32)
        if row_perm is not None:
            w = w[row_perm]
        return (torch.from_numpy(np.array(w.T, np.float32, copy=True)),
                torch.from_numpy(np.array(p["b"], np.float32, copy=True)))

    sd: Dict[str, Any] = {}

    def put(name, p, row_perm=None):
        w, b = lin_out(p, row_perm)
        sd[f"{prefix}{name}.weight"] = w
        sd[f"{prefix}{name}.bias"] = b

    for i, layer in enumerate(params["pts"]):
        perm = inv_pos if i == 0 else (
            inv_skip if (i - 1) in cfg.skips else None
        )
        put(f"pts_linears.{i}", layer, perm)
    if cfg.use_viewdirs:
        put("feature_linear", params["feature"])
        put("alpha_linear", params["alpha"])
        inv_view = np.concatenate(
            [np.arange(W), W + np.argsort(band_permutation(cfg.multires_views))]
        )
        put("views_linears.0", params["views"], inv_view)
        put("rgb_linear", params["rgb"])
    else:
        put("output_linear", params["output"])
    return sd


def _count_tensors(sd: Dict[str, Any]) -> int:
    return len(sd)


def import_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference `.tar` -> {'step', 'coarse', 'fine' (or None), 'cfg'}.

    Mirrors what `create_nerf` restores (`DS_NeRF/run.py:1658-1670`):
    global_step + coarse/fine net weights (optimizer moments are torch-Adam
    internal and are not carried over — fine-tuning restarts Adam, which the
    reference itself effectively does whenever `lrate_decay` resets)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    coarse, cfg = import_nerf_state_dict(ckpt["network_fn_state_dict"])
    fine, fine_cfg = None, None
    fine_sd = ckpt.get("network_fine_state_dict")
    if fine_sd is not None:
        # the fine net may differ (reference --netdepth_fine/--netwidth_fine,
        # `DS_NeRF/run.py:1520-1527`) — infer its config independently
        fine, fine_cfg = import_nerf_state_dict(fine_sd)
    return {
        "step": int(ckpt.get("global_step", 0)),
        "coarse": coarse,
        "fine": fine,
        "cfg": cfg,
        "fine_cfg": fine_cfg,
    }


def export_reference_checkpoint(
    params: Dict[str, Any],
    cfg: NeRFMLPConfig,
    step: int,
    path: str,
    lrate: float = 5e-4,
    fine_cfg: Optional[NeRFMLPConfig] = None,
) -> None:
    """Write our {'coarse', 'fine'} params as a reference-loadable `.tar`.

    `fine_cfg` covers a fine net built with different depth/width (reference
    --netdepth_fine/--netwidth_fine); defaults to `cfg`. The optimizer entry
    is a FRESH torch-Adam state dict (state={}, one param group covering
    coarse+fine tensors in the reference's grad_vars order) —
    `optimizer.load_state_dict` accepts it and simply restarts moments
    (`DS_NeRF/run.py:1663`)."""
    import torch

    sd_coarse = export_nerf_state_dict(params["coarse"], cfg)
    sd_fine = (
        export_nerf_state_dict(params["fine"], fine_cfg or cfg)
        if params.get("fine") is not None else None
    )
    n_params = _count_tensors(sd_coarse) + (
        _count_tensors(sd_fine) if sd_fine is not None else 0
    )
    opt_sd = {
        "state": {},
        "param_groups": [{
            "lr": lrate, "betas": (0.9, 0.999), "eps": 1e-8,
            "weight_decay": 0, "amsgrad": False, "maximize": False,
            "foreach": None, "capturable": False, "differentiable": False,
            "fused": None, "params": list(range(n_params)),
        }],
    }
    torch.save(
        {
            "global_step": int(step),
            "network_fn_state_dict": sd_coarse,
            "network_fine_state_dict": sd_fine,
            "optimizer_state_dict": opt_sd,
        },
        path,
    )
