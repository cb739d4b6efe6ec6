#!/bin/bash
# Round-5 critical post-training TPU chain, most-important-first so a
# hard session end truncates only the tail. Strictly serial (1-core host).
set -x
mkdir -p artifacts/round5_eval
W=artifacts/weights

# a) refreshed curve + natural row for the 86k continuation (VERDICT #2)
timeout 2700 python scripts/psnr_vs_throughput.py \
  --weights $W/flagship_cont100k_35000.npz \
  2>&1 | tee artifacts/round5_eval/curve_cont100k.log
timeout 2700 python scripts/eval_natural_benchmark.py --model flagship \
  --weights $W/flagship_cont100k_35000.npz \
  --out artifacts/natural_eval/results_sigma25.jsonl \
  2>&1 | tee artifacts/round5_eval/nat_cont100k.log

# b) sigma 15/50 rows (VERDICT #6)
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

# c) driver-facing bench (warms its cache entries + stability point)
timeout 2400 python bench.py 2>&1 | tee artifacts/round5_eval/bench_a.log

# d) N>=20 crop benchmark, table models (VERDICT #5)
timeout 5400 python scripts/eval_natural_crops.py \
  --snapshots flagship_50k,cont100k,flagship_synthetic_2050,restormer,drunet,dncnn_synthetic,pixel_synthetic \
  2>&1 | tee artifacts/round5_eval/crops_sweep.log

# e) NHWC pixel kernel on-chip numbers (VERDICT #4)
timeout 3600 python scripts/microbench_pixel.py \
  --variants jnp,nhwc,features \
  2>&1 | tee artifacts/round5_eval/pixel_nhwc.log

# f) dncnn extended budget + rows (VERDICT #3)
timeout 3600 python scripts/run_convergence_tpu.py --model dncnn \
  --stage-steps 3600,1200,900,450 --schedule scaled --tag ext \
  --root experiments/convergence_dncnn_ext \
  2>&1 | tee artifacts/convergence_tpu/train_dncnn_ext.log
timeout 1800 python scripts/psnr_vs_throughput.py --model dncnn \
  --weights $W/dncnn_ext_6150.npz \
  2>&1 | tee artifacts/round5_eval/curve_dncnn_ext.log
timeout 1800 python scripts/eval_natural_benchmark.py --model dncnn \
  --weights $W/dncnn_ext_6150.npz \
  --out artifacts/natural_eval/results_sigma25.jsonl \
  2>&1 | tee artifacts/round5_eval/nat_dncnn_ext.log

# g) serving bundles + end-to-end numbers (VERDICT #7)
timeout 3600 python scripts/measure_serving.py \
  2>&1 | tee artifacts/round5_eval/serving.log

# h) swinir smoke (trainability evidence; full 2050 only if time allows,
#    launched separately)
timeout 2700 python scripts/run_convergence_tpu.py --model swinir \
  --stage-steps 30,5,5,5 --schedule scaled --tag smoke \
  --root experiments/convergence_swinir_smoke \
  2>&1 | tee artifacts/round5_eval/swinir_smoke.log

echo ROUND5_CRITICAL_DONE
