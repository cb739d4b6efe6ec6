#!/bin/bash
# Round-4 measurement sequence — strictly serial (single-core host + one
# TPU chip; CLAUDE.md). Ordered by VERDICT r3 priority so the most
# valuable artifacts exist first if the clock runs out. The long-run
# continuation (VERDICT r3 #5) is launched separately at the end with
# whatever wall-clock remains.
# Usage: bash scripts/run_round4.sh 2>&1 | tee /tmp/round4.log
set -x
cd /root/repo

# 1. (VERDICT #1) Train the missing Restormer at the identical
#    2050-step table budget/corpus. Exports
#    artifacts/weights/restormer_synthetic_2050.npz
timeout 7200 python scripts/run_convergence_tpu.py --model restormer --tag synthetic

# 2. (VERDICT #1 + #2) Curve points for the table: flagship-50k with the
#    filter-scales lever, then the three baselines.
timeout 3600 python scripts/psnr_vs_throughput.py --model flagship \
  --weights artifacts/weights/flagship_50k_51000.npz --filter-scales 1,2,3 \
  | tee /tmp/curve_flagship50k.log
timeout 2400 python scripts/psnr_vs_throughput.py --model drunet \
  --weights artifacts/weights/drunet_synthetic_2050.npz | tee /tmp/curve_drunet.log
timeout 2400 python scripts/psnr_vs_throughput.py --model restormer \
  --weights artifacts/weights/restormer_synthetic_2050.npz | tee /tmp/curve_restormer.log
timeout 2400 python scripts/psnr_vs_throughput.py --model dncnn \
  --weights artifacts/weights/dncnn_synthetic_2050.npz | tee /tmp/curve_dncnn.log

# 3. (VERDICT #2) int8 lever: matmul rates + weight-int8 PSNR on the 50k
#    weights.
timeout 3600 python scripts/microbench_int8.py --psnr \
  --weights artifacts/weights/flagship_50k_51000.npz | tee /tmp/int8.log

# 4. (VERDICT #4) Natural masked sweep: refresh results_sigma25.jsonl with
#    masked_psnr for every row + the four table models.
timeout 1200 python scripts/eval_natural_benchmark.py --model flagship \
  --weights artifacts/weights/flagship_50k_51000.npz | tee /tmp/nat_flag50k.log
timeout 1200 python scripts/eval_natural_benchmark.py --model drunet \
  --weights artifacts/weights/drunet_synthetic_2050.npz | tee /tmp/nat_drunet.log
timeout 1200 python scripts/eval_natural_benchmark.py --model restormer \
  --weights artifacts/weights/restormer_synthetic_2050.npz | tee /tmp/nat_restormer.log
timeout 1200 python scripts/eval_natural_benchmark.py --model dncnn \
  --weights artifacts/weights/dncnn_synthetic_2050.npz | tee /tmp/nat_dncnn.log

echo ROUND4-MEASURE-DONE
