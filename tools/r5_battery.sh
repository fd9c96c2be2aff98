#!/bin/bash
# Round-5 battery: the TPU-serialized artifact sequence after the config-5
# lever-stack run (s1_c5_lever10k_r5, launched separately under
# tools/watchdog.py). One job per chip — run these strictly in order.
set -x
cd "$(dirname "$0")/.."

# ---- A2: final eval of the lever-stack run (VERDICT r4 next #1) ----
timeout 3600 python run.py --config configs/spinnerf_scene1_full.txt \
  --expname s1_c5_lever10k_r5 --render_only true --render_test true \
  2>&1 | tee /tmp/r5_a_render.log
timeout 1800 python tools/eval_testview.py --config configs/spinnerf_scene1_full.txt \
  --expname s1_c5_lever10k_r5 2>&1 | tee /tmp/r5_a_eval.log

# ---- B: 2^19 + interval occupancy 10k (VERDICT r4 next #4) ----
timeout 21600 python tools/watchdog.py \
  --progress-file logs_ours/s1_219occ_r5/metrics.jsonl \
  --stall-seconds 900 --cooldown-seconds 180 --max-restarts 8 -- \
  python run.py --config configs/spinnerf_scene1_plain.txt \
  --expname s1_219occ_r5 --hashgrid_log2 19 --megastep 10 \
  --occ_grid true --occ_mode interval --occ_keep 0.5 \
  --i_print 50 --i_weights 1000 --ckpt_keep 3 \
  --i_testset 1000000 --i_video 1000000 --i_img 1000000 \
  2>&1 | tee /tmp/r5_b.log
timeout 1800 python tools/eval_testview.py --config configs/spinnerf_scene1_plain.txt \
  --expname s1_219occ_r5 --hashgrid_log2 19 2>&1 | tee /tmp/r5_b_eval.log

# ---- C: real-scale config-5 sustained >=200 steps (VERDICT r4 next #5) ----
# (mid-run restart exercised by the watchdog crash/stall path if it fires;
# otherwise run C2 below re-launches from the checkpoint to prove resume.)
timeout 14400 python tools/watchdog.py \
  --progress-file logs_ours/s1_c5_realscale_sustain_r5/metrics.jsonl \
  --stall-seconds 900 --cooldown-seconds 180 --max-restarts 6 -- \
  python run.py --config configs/spinnerf_scene1_full.txt \
  --expname s1_c5_realscale_sustain_r5 --sd_size real --megastep 1 \
  --compute_dtype bfloat16 --occ_grid true --N_iters 220 \
  --i_print 20 --i_weights 100 --ckpt_keep 3 \
  --i_img 1000000 --i_testset 1000000 --i_video 1000000 \
  2>&1 | tee /tmp/r5_c.log
# C2: resume for 40 more steps from the committed ckpt (chain-resume with
# 943M guidance params)
timeout 7200 python run.py --config configs/spinnerf_scene1_full.txt \
  --expname s1_c5_realscale_sustain_r5 --sd_size real --megastep 1 \
  --compute_dtype bfloat16 --occ_grid true --N_iters 260 \
  --i_print 20 --i_weights 100 --ckpt_keep 3 \
  --i_img 1000000 --i_testset 1000000 --i_video 1000000 \
  2>&1 | tee /tmp/r5_c2.log

# ---- D: weights-day rerun with the fixed FID wiring (VERDICT r4 next #2) ----
# scene-1 rehearsal: FID reports the TRUE gate (needs >=2 images) with the
# Inception weights actually loaded this time
python tools/weights_day.py dry --out /tmp/fake_weights --keep 2>&1 | tail -5
timeout 10800 python tools/weights_day.py run --sd_root /tmp/fake_weights/sd \
  --n_iters 52 --expname s1_weights_day_r5 2>&1 | tee /tmp/r5_d.log
# blender-synth 10-view split: the full weights->features->Frechet path
# emits a NUMERIC FID through the same one-command tool
timeout 10800 python tools/weights_day.py run --sd_root /tmp/fake_weights/sd \
  --config configs/blender_synth.txt --skip_train \
  --expname blender_synth 2>&1 | tee /tmp/r5_d2.log

# ---- E: fused-kernel precision/block ablation (VERDICT r4 next #3) ----
timeout 7200 python tools/bench_fused_train.py 30 2>&1 | tee /tmp/r5_e.log
