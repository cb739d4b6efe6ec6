"""Evaluation harness: benchmark-protocol full-image eval, metrics,
tiled inference."""

from irdu_tpu.eval.metrics import img_as_ubyte, psnr_255
from irdu_tpu.eval.harness import evaluate_pairs, pad_to_multiple, run_benchmark_eval
