"""Reference `.tar` checkpoint interop: golden parity against a hand-built
torch NeRF.

Same strategy as tests/test_torch_parity_fullgraph.py: the torch module below
is constructed from the ARCHITECTURE the reference defines
(`DS_NeRF/run_nerf_helpers.py:74-156`: D x W MLP, skip re-inject at layer 4,
viewdir branch of W/2, sigma/rgb heads; embedder `:22-70`: include-input +
interleaved sin/cos log-sampled bands) — written fresh here, not copied — and
its randomly-initialized state dict must round-trip through
`mvip_tpu.interop.torch_ckpt` to the SAME function: torch forward vs our
`apply_nerf_mlp` on raw (pts, viewdirs)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mvip_tpu.interop.torch_ckpt import (  # noqa: E402
    export_nerf_state_dict,
    export_reference_checkpoint,
    import_nerf_state_dict,
    import_reference_checkpoint,
    infer_mlp_config,
)
from mvip_tpu.models.nerf_mlp import NeRFMLPConfig, apply_nerf_mlp, init_nerf_mlp  # noqa: E402


def torch_embed(x: torch.Tensor, num_freqs: int) -> torch.Tensor:
    """Reference channel order: [x | sin f0 | cos f0 | sin f1 | ...]."""
    outs = [x]
    for j in range(num_freqs):
        f = 2.0 ** j
        outs.append(torch.sin(x * f))
        outs.append(torch.cos(x * f))
    return torch.cat(outs, -1)


class TorchNeRF(nn.Module):
    """The reference's NeRF module graph (see module docstring)."""

    def __init__(self, D=4, W=32, input_ch=27, input_ch_views=15, skips=(2,),
                 use_viewdirs=True, output_ch=4):
        super().__init__()
        self.skips = skips
        self.use_viewdirs = use_viewdirs
        self.pts_linears = nn.ModuleList(
            [nn.Linear(input_ch, W)]
            + [
                nn.Linear(W + input_ch, W) if i in skips else nn.Linear(W, W)
                for i in range(D - 1)
            ]
        )
        if use_viewdirs:
            self.views_linears = nn.ModuleList(
                [nn.Linear(input_ch_views + W, W // 2)]
            )
            self.feature_linear = nn.Linear(W, W)
            self.alpha_linear = nn.Linear(W, 1)
            self.rgb_linear = nn.Linear(W // 2, 3)
        else:
            self.output_linear = nn.Linear(W, output_ch)

    def forward(self, input_pts, input_views=None):
        h = input_pts
        for i, lin in enumerate(self.pts_linears):
            h = torch.relu(lin(h))
            if i in self.skips:
                h = torch.cat([input_pts, h], -1)
        if not self.use_viewdirs:
            return self.output_linear(h)
        alpha = self.alpha_linear(h)
        feature = self.feature_linear(h)
        h = torch.cat([feature, input_views], -1)
        h = torch.relu(self.views_linears[0](h))
        rgb = self.rgb_linear(h)
        return torch.cat([rgb, alpha], -1)


def _golden(tn: TorchNeRF, multires: int, multires_views: int, n=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    with torch.no_grad():
        e_pts = torch_embed(torch.from_numpy(pts), multires)
        args = (e_pts,)
        if tn.use_viewdirs:
            args += (torch_embed(torch.from_numpy(dirs), multires_views),)
        ref = tn(*args).numpy()
    return pts, dirs, ref


@pytest.mark.parametrize("prefix", ["", "module."])
def test_import_matches_torch_forward(prefix):
    torch.manual_seed(0)
    tn = TorchNeRF()
    sd = {f"{prefix}{k}": v for k, v in tn.state_dict().items()}
    params, cfg = import_nerf_state_dict(sd)
    assert cfg == NeRFMLPConfig(depth=4, width=32, skips=(2,),
                                use_viewdirs=True, multires=4,
                                multires_views=2, output_ch=4)
    pts, dirs, ref = _golden(tn, cfg.multires, cfg.multires_views)
    out = apply_nerf_mlp(params, cfg, jnp.asarray(pts), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_import_no_viewdirs():
    torch.manual_seed(1)
    tn = TorchNeRF(use_viewdirs=False)
    params, cfg = import_nerf_state_dict(tn.state_dict())
    assert not cfg.use_viewdirs and cfg.output_ch == 4
    pts, _, ref = _golden(tn, cfg.multires, 0)
    out = apply_nerf_mlp(params, cfg, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_export_roundtrip_and_torch_load():
    """export -> torch load_state_dict into the hand-built module -> forward
    must equal ours; then import back and compare trees exactly."""
    cfg = NeRFMLPConfig(depth=4, width=32, skips=(2,), multires=4,
                        multires_views=2)
    params = init_nerf_mlp(jax.random.PRNGKey(3), cfg)
    sd = export_nerf_state_dict(params, cfg, prefix="")
    tn = TorchNeRF()
    tn.load_state_dict(sd)

    pts, dirs, ref = _golden(tn, cfg.multires, cfg.multires_views, seed=5)
    out = apply_nerf_mlp(params, cfg, jnp.asarray(pts), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    back, cfg2 = import_nerf_state_dict(sd)
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_tar_checkpoint_roundtrip(tmp_path):
    """Full container: export_reference_checkpoint writes the reference's
    save dict (`DS_NeRF/run.py:1043-1053` keys, module.-prefixed nets, fresh
    Adam group); import_reference_checkpoint restores step + both nets, and a
    torch Adam accepts the optimizer entry."""
    cfg = NeRFMLPConfig(depth=4, width=32, skips=(2,), multires=4,
                        multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(0), cfg),
        "fine": init_nerf_mlp(jax.random.PRNGKey(1), cfg),
    }
    path = str(tmp_path / "007000.tar")
    export_reference_checkpoint(params, cfg, 7000, path, lrate=3e-3)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["global_step"] == 7000
    assert all(k.startswith("module.") for k in ckpt["network_fn_state_dict"])
    # the reference's DataParallel-wrapped load path accepts the keys
    tn = nn.DataParallel(TorchNeRF())
    tn.load_state_dict(ckpt["network_fine_state_dict"])
    # torch Adam over the reference's grad_vars accepts the optimizer entry
    grad_vars = list(tn.parameters()) + list(nn.DataParallel(TorchNeRF()).parameters())
    opt = torch.optim.Adam(grad_vars, lr=1e-4)
    opt.load_state_dict(ckpt["optimizer_state_dict"])
    assert opt.param_groups[0]["lr"] == pytest.approx(3e-3)

    data = import_reference_checkpoint(path)
    assert data["step"] == 7000 and data["cfg"] == cfg
    for a, b in zip(jax.tree.leaves(params["fine"]),
                    jax.tree.leaves(data["fine"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_restore_from_path_tar(tmp_path):
    """--ft_path some.tar lands in the trainer's TrainState with the step and
    params carried over; a backbone mismatch raises the helpful error."""
    from mvip_tpu.train.checkpoint import restore_from_path
    from mvip_tpu.train.state import create_train_state, make_optimizer

    cfg = NeRFMLPConfig(depth=4, width=32, skips=(2,), multires=4,
                        multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(0), cfg),
        "fine": init_nerf_mlp(jax.random.PRNGKey(1), cfg),
    }
    path = str(tmp_path / "003000.tar")
    export_reference_checkpoint(params, cfg, 3000, path)

    state = create_train_state(
        {
            "coarse": init_nerf_mlp(jax.random.PRNGKey(7), cfg),
            "fine": init_nerf_mlp(jax.random.PRNGKey(8), cfg),
        },
        make_optimizer(3e-3, 10),
    )
    restored = restore_from_path(path, state)
    assert int(restored.step) == 3000
    np.testing.assert_allclose(
        np.asarray(restored.params["coarse"]["pts"][0]["w"]),
        np.asarray(params["coarse"]["pts"][0]["w"]), atol=1e-7,
    )

    bad = create_train_state(
        {"coarse": init_nerf_mlp(jax.random.PRNGKey(9),
                                 NeRFMLPConfig(depth=2, width=16, skips=(),
                                               multires=4, multires_views=2))},
        make_optimizer(3e-3, 10),
    )
    with pytest.raises(ValueError, match="does not match"):
        restore_from_path(path, bad)


def test_asymmetric_fine_net_roundtrip(tmp_path):
    """Coarse and fine nets with different depth/width (reference
    --netdepth_fine/--netwidth_fine, `DS_NeRF/run.py:1520-1527`) export and
    import with their own inferred configs; exporting with the wrong cfg
    raises instead of silently mis-slicing."""
    from mvip_tpu.interop.torch_ckpt import export_reference_checkpoint

    ccfg = NeRFMLPConfig(depth=2, width=32, skips=(), multires=4,
                         multires_views=2)
    fcfg = NeRFMLPConfig(depth=4, width=64, skips=(2,), multires=4,
                         multires_views=2)
    params = {
        "coarse": init_nerf_mlp(jax.random.PRNGKey(0), ccfg),
        "fine": init_nerf_mlp(jax.random.PRNGKey(1), fcfg),
    }
    path = str(tmp_path / "001000.tar")
    export_reference_checkpoint(params, ccfg, 1000, path, fine_cfg=fcfg)
    data = import_reference_checkpoint(path)
    assert data["cfg"] == ccfg and data["fine_cfg"] == fcfg
    for a, b in zip(jax.tree.leaves(params["fine"]),
                    jax.tree.leaves(data["fine"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    with pytest.raises(ValueError, match="do not match cfg"):
        export_reference_checkpoint(params, ccfg, 1000, path)  # no fine_cfg
