#!/bin/bash
# Round-5 post-training serial TPU schedule (one compute job at a time —
# this host has ONE core and the compile tunnel contends; CLAUDE.md).
# Each step is independently resumable; logs under artifacts/round5_eval/.
set -x
mkdir -p artifacts/round5_eval
W=artifacts/weights

# 1) refreshed curve for the 86k continuation weights (VERDICT r4 #2)
timeout 2700 python scripts/psnr_vs_throughput.py \
  --weights $W/flagship_cont100k_35000.npz \
  2>&1 | tee artifacts/round5_eval/curve_cont100k.log

# 2) natural whole-image row for the continuation weights
timeout 2700 python scripts/eval_natural_benchmark.py --model flagship \
  --weights $W/flagship_cont100k_35000.npz \
  --out artifacts/natural_eval/results_sigma25.jsonl \
  2>&1 | tee artifacts/round5_eval/nat_cont100k.log

# 3) sigma 15/50 evaluated rows (VERDICT r4 #6) — curve + natural
timeout 2700 python scripts/psnr_vs_throughput.py \
  --weights $W/flagship_synthetic_s15_2050.npz --sigma 15 \
  2>&1 | tee artifacts/round5_eval/curve_s15.log
timeout 1800 python scripts/psnr_vs_throughput.py \
  --weights $W/flagship_synthetic_s50_2050.npz --sigma 50 \
  2>&1 | tee artifacts/round5_eval/curve_s50.log
timeout 1800 python scripts/eval_natural_benchmark.py --model flagship \
  --weights $W/flagship_synthetic_s15_2050.npz --sigma 15 \
  --out artifacts/natural_eval/results_sigma15.jsonl \
  2>&1 | tee artifacts/round5_eval/nat_s15.log
timeout 1800 python scripts/eval_natural_benchmark.py --model flagship \
  --weights $W/flagship_synthetic_s50_2050.npz --sigma 50 \
  --out artifacts/natural_eval/results_sigma50.jsonl \
  2>&1 | tee artifacts/round5_eval/nat_s50.log

# 4) N>=20 natural crop benchmark, full sweep (VERDICT r4 #5)
timeout 5400 python scripts/eval_natural_crops.py \
  2>&1 | tee artifacts/round5_eval/crops_sweep.log

# 5) dncnn extended to a 6150-step budget (VERDICT r4 #3: de-strawman)
timeout 3600 python scripts/run_convergence_tpu.py --model dncnn \
  --stage-steps 3600,1200,900,450 --schedule scaled --tag ext \
  --root experiments/convergence_dncnn_ext \
  2>&1 | tee artifacts/convergence_tpu/train_dncnn_ext.log

# 6) swinir at the shared 2050 budget (VERDICT r4 #3: last untrained
#    baseline) — smoke first (compile + stability), then the full run
#    rides the warm cache
timeout 3600 python scripts/run_convergence_tpu.py --model swinir \
  --stage-steps 30,5,5,5 --schedule scaled --tag smoke \
  --root experiments/convergence_swinir_smoke \
  2>&1 | tee artifacts/round5_eval/swinir_smoke.log
timeout 7200 python scripts/run_convergence_tpu.py --model swinir \
  --schedule scaled --root experiments/convergence_swinir \
  2>&1 | tee artifacts/convergence_tpu/train_swinir.log

# 7) table rows for the new baseline runs
timeout 2700 python scripts/psnr_vs_throughput.py --model dncnn \
  --weights $W/dncnn_ext_6150.npz \
  2>&1 | tee artifacts/round5_eval/curve_dncnn_ext.log
timeout 2700 python scripts/eval_natural_benchmark.py --model dncnn \
  --weights $W/dncnn_ext_6150.npz \
  --out artifacts/natural_eval/results_sigma25.jsonl \
  2>&1 | tee artifacts/round5_eval/nat_dncnn_ext.log
timeout 3600 python scripts/psnr_vs_throughput.py --model swinir \
  --weights $W/swinir_synthetic_2050.npz \
  2>&1 | tee artifacts/round5_eval/curve_swinir.log
timeout 2700 python scripts/eval_natural_benchmark.py --model swinir \
  --weights $W/swinir_synthetic_2050.npz \
  --out artifacts/natural_eval/results_sigma25.jsonl \
  2>&1 | tee artifacts/round5_eval/nat_swinir.log

# 8) STRETCH — restormer continued to the flagship-ext 6050-class budget
#    (equal-budget frontier pairing, VERDICT r4 weak #2); warm-start +
#    scaled (annealing) schedule per the round-4 stability finding
timeout 10800 python scripts/run_convergence_tpu.py --model restormer \
  --init-weights $W/restormer_synthetic_2050.npz \
  --stage-steps 2400,800,600,250 --schedule scaled --tag ext6050 \
  --root experiments/convergence_restormer_ext \
  2>&1 | tee artifacts/convergence_tpu/train_restormer_ext.log
timeout 2700 python scripts/psnr_vs_throughput.py --model restormer \
  --weights $W/restormer_ext6050_4050.npz \
  2>&1 | tee artifacts/round5_eval/curve_restormer_ext.log
timeout 2700 python scripts/eval_natural_benchmark.py --model restormer \
  --weights $W/restormer_ext6050_4050.npz \
  --out artifacts/natural_eval/results_sigma25.jsonl \
  2>&1 | tee artifacts/round5_eval/nat_restormer_ext.log

echo ROUND5_POSTTRAIN_DONE
