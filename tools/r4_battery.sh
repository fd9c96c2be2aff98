#!/bin/bash
# Round-4 post-2^19 TPU battery — run ONLY after the s1_plain219_r4 chain
# finishes (one job per chip; QUIET host for every rays/s window).
#
#   bash tools/r4_battery.sh 2>&1 | tee /tmp/r4_battery.log
#
# Phases:
#   1. 2^19 final held-out eval (closes r2 ask #7 / VERDICT r3 next #2).
#   2. Config-5 phase budget + occ_keep_guidance lever probe (VERDICT #4).
#   3. Config-5 500-step quality probe with all three levers vs the
#      canonical run's first 500 steps (trajectory neutrality evidence).
#   4. Real-scale probes + weights-day rehearsal (tools/realscale_probes.sh,
#      VERDICT #5 and #7) — needs /tmp/fake_weights from weights_day dry.
#   5. Warm bench.py (driver cache).
set -x
cd "$(dirname "$0")/.."

# 1. final eval of the 2^19 quality run
timeout 3000 python tools/eval_testview.py \
  --config configs/spinnerf_scene1_plain.txt --expname s1_plain219_r4 \
  --hashgrid_log2 19 --no_occ_grid 2>&1 | tee /tmp/eval219.log

# 2a. lever probe: phase budget at occ_keep_guidance=0.25 + f2 + fuse
# (5 fresh step-variant compiles: generous timeout)
timeout 4800 python tools/profile_mvip_phases.py \
  --sds_render_factor 2 --fuse_guidance_renders true \
  --occ_keep_guidance 0.25 --iters 10 2>&1 | tee /tmp/phases_keepg.log

# 3. 500-step config-5 quality probe with the lever stack
timeout 3000 python run.py --config configs/spinnerf_scene1_full.txt \
  --expname s1_c5_fast_r4 --sds_render_factor 2 \
  --fuse_guidance_renders true --occ_keep_guidance 0.25 \
  --N_iters 505 --i_print 50 --i_weights 100000 --i_img 1000000 \
  --i_testset 1000000 --i_video 1000000 2>&1 | tee /tmp/c5fast.log

# 4. real-scale probes (config-1 ≥100 steps, config-5 12 steps, weights-day)
bash tools/realscale_probes.sh 2>&1 | tee /tmp/realscale.log

# 5. warm bench for the driver
timeout 5400 python bench.py 2>&1 | tee /tmp/bench_r4.log
