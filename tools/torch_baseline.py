#!/usr/bin/env python
"""Measure the PyTorch reference baseline for BASELINE.md.

Re-implements the reference's per-step training compute (DS_NeRF/run.py second
stage, guidance off, --no_tcnn MLP backbone) in PyTorch so it runs on this host's
CPU (the reference itself hard-requires CUDA + diffusers): 1024 rays, 64 coarse +
64 importance samples through an 8x256 PE-MLP coarse+fine pair, alpha compositing,
inverse-CDF importance resampling, MSE + depth losses, Adam step.

Writes BASELINE_MEASURED.json consumed by bench.py's vs_baseline.
"""

import json
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

N_RAND = 1024
N_SAMPLES = 64
N_IMPORTANCE = 64
WARMUP = 2
ITERS = 8


def embed(x, n_freqs):
    out = [x]
    for i in range(n_freqs):
        f = 2.0**i
        out += [torch.sin(x * f), torch.cos(x * f)]
    return torch.cat(out, -1)


class MLP(nn.Module):
    def __init__(self, D=8, W=256, in_ch=63, in_ch_views=27):
        super().__init__()
        self.in_ch, self.in_ch_views = in_ch, in_ch_views
        layers = [nn.Linear(in_ch, W)]
        for i in range(D - 1):
            layers.append(nn.Linear(W + in_ch if i == 4 else W, W))
        self.pts = nn.ModuleList(layers)
        self.feature = nn.Linear(W, W)
        self.alpha = nn.Linear(W, 1)
        self.views = nn.Linear(W + in_ch_views, W // 2)
        self.rgb = nn.Linear(W // 2, 3)

    def forward(self, pe, ve):
        h = pe
        for i, l in enumerate(self.pts):
            h = F.relu(l(h))
            if i == 4:
                h = torch.cat([pe, h], -1)
        sigma = self.alpha(h)
        feat = self.feature(h)
        h = F.relu(self.views(torch.cat([feat, ve], -1)))
        return torch.cat([self.rgb(h), sigma], -1)


def composite(raw, z_vals, rays_d, noise_std=1.0):
    dists = torch.cat(
        [z_vals[..., 1:] - z_vals[..., :-1], torch.full_like(z_vals[..., :1], 1e10)], -1
    ) * rays_d.norm(dim=-1, keepdim=True)
    noise = torch.randn_like(raw[..., 3]) * noise_std
    alpha = 1.0 - torch.exp(-F.relu(raw[..., 3] + noise) * dists)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1
    )[..., :-1]
    w = alpha * trans
    rgb = (w[..., None] * torch.sigmoid(raw[..., :3])).sum(-2)
    depth = (w * z_vals).sum(-1)
    acc = w.sum(-1)
    disp = 1.0 / torch.clamp(depth / torch.clamp(acc, min=1e-10), min=1e-10)
    return rgb + (1.0 - acc[..., None]), disp, acc, w, depth


def sample_pdf(bins, weights, n, device):
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.rand(list(cdf.shape[:-1]) + [n], device=device)
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    cdf_b = torch.gather(cdf, -1, below)
    cdf_a = torch.gather(cdf, -1, above)
    bins_b = torch.gather(bins, -1, torch.clamp(below, max=bins.shape[-1] - 1))
    bins_a = torch.gather(bins, -1, torch.clamp(above, max=bins.shape[-1] - 1))
    denom = torch.where(cdf_a - cdf_b < 1e-5, torch.ones_like(cdf_b), cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def render(rays_o, rays_d, coarse, fine, near, far, device):
    n = rays_o.shape[0]
    t = torch.linspace(0.0, 1.0, N_SAMPLES, device=device)
    z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)  # lindisp
    z = z.expand(n, N_SAMPLES)
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    upper = torch.cat([mids, z[..., -1:]], -1)
    lower = torch.cat([z[..., :1], mids], -1)
    z = lower + (upper - lower) * torch.rand_like(z)
    vd = rays_d / rays_d.norm(dim=-1, keepdim=True)

    def run(net, z_vals):
        pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
        pe = embed(pts.reshape(-1, 3), 10)
        ve = embed(vd[:, None].expand(-1, z_vals.shape[-1], -1).reshape(-1, 3), 4)
        raw = net(pe, ve).reshape(n, z_vals.shape[-1], 4)
        return composite(raw, z_vals, rays_d)

    rgb0, disp0, _, w, _ = run(coarse, z)
    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
    z_new = sample_pdf(z_mid, w[..., 1:-1].detach(), N_IMPORTANCE, device)
    z_all, _ = torch.sort(torch.cat([z, z_new.detach()], -1), -1)
    rgb, disp, _, _, _ = run(fine, z_all)
    return rgb, disp, rgb0


def main():
    device = "cuda" if torch.cuda.is_available() else "cpu"
    torch.manual_seed(0)
    coarse, fine = MLP().to(device), MLP().to(device)
    opt = torch.optim.Adam(list(coarse.parameters()) + list(fine.parameters()), lr=3e-3)

    rays_o = torch.randn(N_RAND, 3, device=device)
    rays_d = torch.randn(N_RAND, 3, device=device)
    target = torch.rand(N_RAND, 3, device=device)
    target_d = torch.rand(N_RAND, device=device)

    def step():
        opt.zero_grad()
        rgb, _, rgb0 = render(rays_o, rays_d, coarse, fine, 1.2, 7.7, device)
        _, disp2, _ = render(rays_o, rays_d, coarse, fine, 1.2, 7.7, device)
        loss = F.mse_loss(rgb, target) + F.mse_loss(rgb0, target) + 0.1 * F.mse_loss(
            disp2, target_d
        )
        loss.backward()
        opt.step()

    for _ in range(WARMUP):
        step()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        step()
    dt = time.perf_counter() - t0
    rate = ITERS * N_RAND / dt
    out = {
        "torch_cpu_mlp_rays_per_sec": round(rate, 1),
        "device": device,
        "torch_version": torch.__version__,
        "workload": f"{N_RAND} rays, {N_SAMPLES}+{N_IMPORTANCE} samples, coarse+fine 8x256 MLP, 2 renders + depth loss + Adam",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BASELINE_MEASURED.json")
    with open(os.path.abspath(path), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
