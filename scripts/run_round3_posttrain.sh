#!/bin/bash
# Round-3 post-training sequence — strictly serial (single-core host +
# one TPU chip; see CLAUDE.md). Run AFTER the 50k flagship run finishes.
# Ordered so that if the round clock runs out mid-script, the most
# valuable artifacts exist first.
# Usage: bash scripts/run_round3_posttrain.sh 2>&1 | tee /tmp/posttrain.log
set -x
cd /root/repo

# 1. bench.py twice (warms the driver's final-bench compile; the second,
#    warm run is the stability check — round-2 spread was <1.2%)
timeout 2400 python bench.py
timeout 1200 python bench.py

# 2. Benchmark-table baselines at the identical 2050-step budget/corpus
#    (VERDICT r2 #2). Each exports artifacts/weights/<model>_synthetic_2050.npz
timeout 5400 python scripts/run_convergence_tpu.py --model drunet    --tag synthetic
timeout 5400 python scripts/run_convergence_tpu.py --model restormer --tag synthetic
timeout 5400 python scripts/run_convergence_tpu.py --model dncnn     --tag synthetic

# 3. Curve points: 50k flagship (+ filter-scales knob), then baselines
timeout 3600 python scripts/psnr_vs_throughput.py --model flagship \
  --weights artifacts/weights/flagship_50k_51000.npz --filter-scales 1,2,3
timeout 2400 python scripts/psnr_vs_throughput.py --model drunet \
  --weights artifacts/weights/drunet_synthetic_2050.npz
timeout 2400 python scripts/psnr_vs_throughput.py --model restormer \
  --weights artifacts/weights/restormer_synthetic_2050.npz
timeout 2400 python scripts/psnr_vs_throughput.py --model dncnn \
  --weights artifacts/weights/dncnn_synthetic_2050.npz

# 4. int8 lever measurements (VERDICT r2 #3)
timeout 3600 python scripts/microbench_int8.py --psnr \
  --weights artifacts/weights/flagship_50k_51000.npz

# 5. Natural-benchmark sweep w/ masked metric for the 50k snapshot
timeout 2400 python scripts/eval_natural_benchmark.py \
  --model flagship --weights artifacts/weights/flagship_50k_51000.npz

# 6 (time-permitting). Distillation with the real-budget teacher:
#    micro student, 2050-step budget, w=0.3 (the round-2 best)
if [ "$1" = "--with-distill" ]; then
  timeout 5400 python scripts/run_convergence_tpu.py --model micro \
    --distill-from artifacts/weights/flagship_50k_51000.npz \
    --distill-weight 0.3 --tag distill50k
  timeout 2400 python scripts/psnr_vs_throughput.py --model micro \
    --weights artifacts/weights/micro_distill50k_2050.npz
fi

echo POSTTRAIN-DONE
