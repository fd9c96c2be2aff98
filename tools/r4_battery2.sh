#!/bin/bash
# Round-4 battery, part 2 — reruns of the real-scale config-5 phases with
# the bf16 VAE encode (the f32 batch-Nv colla VAE-encode VJP OOMs v5e 16 GB;
# the reference's own pipe is fp16, so bf16 IS the parity configuration),
# plus the config-1 probe continuation past normal_start so the real-scale
# normal-SDS gate demonstrably opens.
set -x
cd "$(dirname "$0")/.."

# A2. config-1 real-scale continuation: auto-resume from step 101, run to
#     520 so steps >500 fire normal SDS (normal_start=500) at 860M scale.
timeout 3000 python run.py --config configs/spinnerf_scene1.txt \
  --expname s1_c1_realscale_probe_r4 --sd_size real --megastep 1 \
  --N_iters 520 --i_print 20 --i_weights 500 --ckpt_keep 2 \
  --i_img 1000000 --i_testset 1000000 --i_video 1000000 --occ_grid true \
  2>&1 | tee /tmp/probe_c1b.log

# B'. config-5 real scale, bf16 VAE encode: AOT HBM report + 12-step probe.
timeout 3600 python tools/hbm_report.py --config configs/spinnerf_scene1_full.txt \
  --expname s1_c5_realscale_hbm --sd_size real --megastep 1 --occ_grid true \
  --compute_dtype bfloat16 2>&1 | tee /tmp/hbm_c5b.log
timeout 3600 python run.py --config configs/spinnerf_scene1_full.txt \
  --expname s1_c5_realscale_probe_r4 --sd_size real --megastep 1 \
  --compute_dtype bfloat16 --N_iters 12 --i_print 1 --i_weights 1000000 \
  --i_img 1000000 --i_testset 1000000 --i_video 1000000 --occ_grid true \
  2>&1 | tee /tmp/probe_c5b.log

# C'. weights-day one-command rehearsal (compute_dtype defaults bf16 now).
timeout 5400 python tools/weights_day.py run --sd_root /tmp/fake_weights/sd \
  --lpips_weights /tmp/fake_weights/lpips_vgg.pt \
  --inception_weights /tmp/fake_weights/pt_inception.pt \
  --n_iters 52 --expname s1_weights_day_r4 2>&1 | tee /tmp/wd_run2.log
