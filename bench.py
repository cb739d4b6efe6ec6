"""Benchmark: flagship (LGU) inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "megapixels/sec/chip", "vs_baseline": N}

Baseline: the reference PyTorch model runs 512×512 color inference in
~0.37 s on its GPU ≈ 0.71 MP/s (BASELINE.md; GGTV_GGLR_v1.0/README.ipynb
cell 12/16 outputs). vs_baseline is our MP/s divided by that.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MP_PER_S = 0.71


def main():
    from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config

    model = AbstractMultiScaleGraphFilter(**flagship_config())

    h = w = 512
    batch = 1
    x = jnp.asarray(np.random.RandomState(0).rand(batch, h, w, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    fwd = jax.jit(model.apply)
    fwd(params, x).block_until_ready()  # compile + warmup

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        y = fwd(params, x)
    y.block_until_ready()
    dt = time.perf_counter() - t0

    mp_per_s = (batch * h * w * n_iters) / dt / 1e6
    print(json.dumps({
        "metric": "flagship_lgu_inference_512x512_fp32",
        "value": round(mp_per_s, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mp_per_s / BASELINE_MP_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
