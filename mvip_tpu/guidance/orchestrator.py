"""Guidance orchestrator: embedding prep, pose sampling, SDS dispatch.

Capability parity with `Pretrain_Model` (`DS_NeRF/nerf/utils.py:174-311`):
holds the frozen guidance bundles + precomputed text embeddings, draws random
orbit poses per step, applies progressive view-range relaxation, and dispatches
to the enabled SDS variants (RGB / collaborative / normal) plus optional CLIP
guidance, returning one scalar guidance loss.

TPU-first: the SDS math itself is pure and jit-cached per input shape (the
jitted closures are built once in __init__); only the pose draw /
progressive-view bookkeeping stays on host, exactly the parts that mutate
python state in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvip_tpu.guidance import clip_guidance as clipg
from mvip_tpu.guidance.poses import rand_poses
from mvip_tpu.guidance.sds import (
    GuidanceModels,
    SDSConfig,
    sds_colla_step,
    sds_normal_step,
    sds_rgb_step,
)


@dataclass
class OrchestratorConfig:
    """The guidance-relevant slice of `mvip_tpu.config.Config`."""

    is_rgb_guidance: bool = True
    rgb_guidance_scale: float = 7.5
    is_normal_guidance: bool = False
    normal_guidance_scale: float = 1.5
    normal_start: int = 500
    is_colla_guidance: bool = False
    colla_guidance_scale: float = 7.5
    lambda_guidance: float = 1.0
    radius_range: tuple = (1.0, 1.5)
    theta_range: tuple = (45.0, 105.0)
    phi_range: tuple = (-180.0, 180.0)
    angle_overhead: float = 30.0
    angle_front: float = 60.0
    uniform_sphere_rate: float = 0.5
    default_azimuth: float = 0.0
    default_polar: float = 90.0
    default_radius: float = 1.2
    progressive_view: bool = False
    progressive_view_init_ratio: float = 0.2
    exp_start_iter: int = 0
    exp_end_iter: int = 10000

    @classmethod
    def from_config(cls, cfg) -> "OrchestratorConfig":
        names = {f for f in cls.__dataclass_fields__}
        kw = {n: getattr(cfg, n) for n in names if hasattr(cfg, n)}
        for k in ("radius_range", "theta_range", "phi_range"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


class GuidanceOrchestrator:
    """Stateful wrapper (global step, progressive ranges) over pure SDS fns."""

    def __init__(
        self,
        ocfg: OrchestratorConfig,
        sd: Optional[GuidanceModels] = None,
        sds_cfg: Optional[SDSConfig] = None,
        text_embeds: Optional[Dict[str, jnp.ndarray]] = None,  # 'uncond','cond','cond_normal'
        clip: Optional[clipg.CLIPGuidance] = None,
        clip_text_z: Optional[jnp.ndarray] = None,
        colla_apply: str = "all",
        anneal_over_neighbors: bool = False,
    ):
        self.ocfg = ocfg
        self.sd = sd
        self.clip = clip
        self.clip_text_z = clip_text_z
        self.global_step = 0
        # mutable progressive-view state (`nerf/utils.py:264-273`)
        self.phi_range = list(ocfg.phi_range)
        self.theta_range = list(ocfg.theta_range)
        self.radius_range = list(ocfg.radius_range)

        if sd is not None:
            assert text_embeds is not None, "SD guidance requires text embeddings"
            uncond = text_embeds["uncond"]
            cond = text_embeds["cond"]
            cond_n = text_embeds.get("cond_normal", cond)
            self._pair_rgb = jnp.concatenate([uncond, cond], 0)        # [2,T,C]
            self._pair_normal = jnp.concatenate([uncond, cond_n], 0)

            import dataclasses

            base = sds_cfg or SDSConfig()
            cfg_rgb = dataclasses.replace(
                base, guidance_scale=ocfg.rgb_guidance_scale, grad_scale=ocfg.lambda_guidance)
            cfg_nrm = dataclasses.replace(
                base, guidance_scale=ocfg.normal_guidance_scale, grad_scale=ocfg.lambda_guidance)
            cfg_col = dataclasses.replace(
                base, guidance_scale=ocfg.colla_guidance_scale, grad_scale=ocfg.lambda_guidance)

            self.sds_rgb = jax.jit(
                lambda key, i, img, m: sds_rgb_step(key, sd, cfg_rgb, i, img, m, self._pair_rgb)
            )
            self.sds_normal = jax.jit(
                lambda key, i, nm, m: sds_normal_step(
                    key, sd, cfg_nrm, i, nm, m, self._pair_normal,
                    normal_start=ocfg.normal_start)
            )
            self.sds_colla = jax.jit(
                lambda key, i, imgs, ms: sds_colla_step(
                    key, sd, cfg_col, i, imgs, ms, self._pair_rgb,
                    anneal_over_neighbors=anneal_over_neighbors,
                    colla_apply=colla_apply)
            )

    # --- pose sampling / progressive view (host-side python state) ------------

    def sample_poses(self, key, batch: int = 1):
        """Random orbit poses + azimuth deltas (`nerf/utils.py:239-251`)."""
        poses, dirs, thetas, phis, radius = rand_poses(
            key, batch,
            radius_range=tuple(self.radius_range),
            theta_range=tuple(self.theta_range),
            phi_range=tuple(self.phi_range),
            return_dirs=True,
            angle_overhead=self.ocfg.angle_overhead,
            angle_front=self.ocfg.angle_front,
            uniform_sphere_rate=self.ocfg.uniform_sphere_rate,
        )
        delta_az = np.asarray(phis) - self.ocfg.default_azimuth
        delta_az = np.where(delta_az > 180, delta_az - 360, delta_az)
        return poses, dirs, delta_az

    def _progressive_update(self):
        o = self.ocfg
        ratio = (self.global_step - o.exp_start_iter) / max(
            1, o.exp_end_iter - o.exp_start_iter
        )
        r = min(1.0, o.progressive_view_init_ratio + 2.0 * ratio)
        self.phi_range = [o.default_azimuth * (1 - r) + o.phi_range[0] * r,
                          o.default_azimuth * (1 - r) + o.phi_range[1] * r]
        self.theta_range = [o.default_polar * (1 - r) + o.theta_range[0] * r,
                            o.default_polar * (1 - r) + o.theta_range[1] * r]
        self.radius_range = [o.default_radius * (1 - r) + o.radius_range[0] * r,
                             o.default_radius * (1 - r) + o.radius_range[1] * r]

    # --- dispatch (`nerf/utils.py:222-311`) ------------------------------------

    def cal_loss(
        self,
        key,
        i: int,
        combined_rgb: Optional[jnp.ndarray] = None,   # [1,H,W,3] GT outside mask, render inside
        mask: Optional[jnp.ndarray] = None,           # [1,H,W,1]
        normal_map: Optional[jnp.ndarray] = None,     # [1,H,W,3]
        neighbor_rgbs: Optional[jnp.ndarray] = None,  # [N,H,W,3]
        neighbor_masks: Optional[jnp.ndarray] = None, # [N,H,W,1]
        pred_rgb: Optional[jnp.ndarray] = None,       # for CLIP guidance
    ):
        o = self.ocfg
        self.global_step += 1
        k_pose, k_rgb, k_col, k_nrm = jax.random.split(key, 4)
        # pose draw kept for parity (azimuth feeds directional prompts, which the
        # active SD path does not consume — `nerf/utils.py:239-254`)
        self.sample_poses(k_pose)
        if o.progressive_view:
            self._progressive_update()

        loss = jnp.zeros(())
        if self.sd is not None:
            if o.is_rgb_guidance and combined_rgb is not None:
                loss = loss + self.sds_rgb(k_rgb, i, combined_rgb, mask)
            if o.is_colla_guidance and i > 0 and neighbor_rgbs is not None:
                loss = loss + self.sds_colla(k_col, i, neighbor_rgbs, neighbor_masks)
            if o.is_normal_guidance and i > o.normal_start and normal_map is not None:
                loss = loss + self.sds_normal(k_nrm, i, normal_map, mask)
        if self.clip is not None and self.clip_text_z is not None and pred_rgb is not None:
            loss = loss + clipg.clip_loss(self.clip, self.clip_text_z, pred_rgb)
        return loss
