#!/bin/bash
# Real-scale guidance training probes (VERDICT r3 next #5) — run on a QUIET
# host with the TPU free (one job per chip; serialize with any training run).
#
# Prereq for weights-day: a synthesized (or real) SD tree, e.g.
#   python tools/weights_day.py dry --keep --out /tmp/fake_weights
#
# Each phase prints/logs into logs_ours/<expname>; peak-HBM evidence comes
# from tools/hbm_report.py (AOT buffer assignment — the tunnel hides runtime
# memory_stats). megastep MUST stay 1 at sd_size=real (ROADMAP r3: megastep>1
# multiplies the traced UNet graph; compile >25 min).
set -ex
cd "$(dirname "$0")/.."

# A. config-1 shape (RGB + normal SDS) at real scale: AOT HBM report (also
#    warms the compile cache for the probe run), then >=100 training steps.
timeout 3000 python tools/hbm_report.py --config configs/spinnerf_scene1.txt \
  --expname s1_c1_realscale_hbm --sd_size real --megastep 1 --occ_grid true \
  2>&1 | tee /tmp/hbm_c1.log
timeout 3000 python run.py --config configs/spinnerf_scene1.txt \
  --expname s1_c1_realscale_probe_r4 --sd_size real --megastep 1 \
  --N_iters 120 --i_print 10 --i_weights 100 --ckpt_keep 2 \
  --i_img 1000000 --i_testset 1000000 --i_video 1000000 --occ_grid true \
  2>&1 | tee /tmp/probe_c1.log

# B. config-5 shape (adds batch-Nv colla UNet at real scale), a few steps.
timeout 3600 python tools/hbm_report.py --config configs/spinnerf_scene1_full.txt \
  --expname s1_c5_realscale_hbm --sd_size real --megastep 1 --occ_grid true \
  2>&1 | tee /tmp/hbm_c5.log
timeout 3600 python run.py --config configs/spinnerf_scene1_full.txt \
  --expname s1_c5_realscale_probe_r4 --sd_size real --megastep 1 \
  --N_iters 12 --i_print 1 --i_weights 1000000 \
  --i_img 1000000 --i_testset 1000000 --i_video 1000000 --occ_grid true \
  2>&1 | tee /tmp/probe_c5.log

# C. weights-day one-command rehearsal: short real-scale train from the
#    synthesized tree -> testset render -> PSNR/LPIPS/FID emission.
timeout 3600 python tools/weights_day.py run --sd_root /tmp/fake_weights/sd \
  --lpips_weights /tmp/fake_weights/lpips_vgg.pt \
  --inception_weights /tmp/fake_weights/pt_inception.pt \
  --n_iters 52 --expname s1_weights_day_r4 2>&1 | tee /tmp/wd_run.log
