"""Diffusion / CLIP guidance subsystem (TPU-native).

Re-implements the capability of the reference's `DS_NeRF/guidance/` +
`DS_NeRF/nerf/utils.py` stack — Stable-Diffusion-inpainting Score Distillation
Sampling on rendered RGB, rendered normal maps, and collaboratively across
neighboring views — as pure JAX on NHWC tensors:

- `scheduler`    — diffusion noise schedule + timestep annealing
                   (reference `guidance/sd_utils.py:90-101,363`)
- `layers`       — conv/norm/attention building blocks (MXU-shaped, NHWC)
- `vae`          — AutoencoderKL encoder/decoder (reference uses diffusers VAE)
- `unet`         — 9-channel inpainting UNet with cross-attention
                   (reference `guidance/sd_utils.py:394-403`)
- `clip_text`    — CLIP text transformer (reference `sd_utils.py:110-117`)
- `clip_guidance`— CLIP image-text similarity guidance (`guidance/clip_utils.py`)
- `sds`          — the three SDS train steps + gradient injection
                   (reference `sd_utils.py:120-599`, `SpecifyGradient` `:21-37`)
- `orchestrator` — guidance dispatch, orbit-pose sampling, progressive view
                   (reference `nerf/utils.py:102-311`)
- `weights`      — HF checkpoint -> pytree porting (gated on availability)
"""
