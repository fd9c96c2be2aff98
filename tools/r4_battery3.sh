#!/bin/bash
# Round-4 battery, part 3: config-5 real-scale phases again, now with BOTH
# memory fixes in (bf16 VAE encode + query-chunked attention). Part 2's A2
# (config-1 continuation past normal_start) already succeeded.
set -x
cd "$(dirname "$0")/.."

timeout 3600 python tools/hbm_report.py --config configs/spinnerf_scene1_full.txt \
  --expname s1_c5_realscale_hbm --sd_size real --megastep 1 --occ_grid true \
  --compute_dtype bfloat16 2>&1 | tee /tmp/hbm_c5c.log
timeout 3600 python run.py --config configs/spinnerf_scene1_full.txt \
  --expname s1_c5_realscale_probe_r4 --sd_size real --megastep 1 \
  --compute_dtype bfloat16 --N_iters 12 --i_print 1 --i_weights 1000000 \
  --i_img 1000000 --i_testset 1000000 --i_video 1000000 --occ_grid true \
  2>&1 | tee /tmp/probe_c5c.log
timeout 7200 python tools/weights_day.py run --sd_root /tmp/fake_weights/sd \
  --lpips_weights /tmp/fake_weights/lpips_vgg.pt \
  --inception_weights /tmp/fake_weights/pt_inception.pt \
  --n_iters 52 --expname s1_weights_day_r4 2>&1 | tee /tmp/wd_run3.log
