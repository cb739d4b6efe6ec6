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

    # inference config: bf16 params/activations + fused Pallas blocks
    model = AbstractMultiScaleGraphFilter(use_pallas_blocks=True, **flagship_config())

    h = w = 512
    batch = 1
    x32 = jnp.asarray(np.random.RandomState(0).rand(batch, h, w, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x32)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    x = x32.astype(jnp.bfloat16)

    fwd = jax.jit(model.apply)
    fwd(params, x).block_until_ready()  # compile + warmup

    # data-dependent chaining + a HOST READBACK of the result: through this
    # remote-execution tunnel, block_until_ready can return before compute
    # finishes (a free-running loop "measures" >1000 MP/s); transferring a
    # scalar derived from the final value cannot lie.
    float(jnp.mean(fwd(params, x).astype(jnp.float32)))  # full warmup incl. mean
    n_iters = 10
    best = float("inf")
    for _ in range(3):
        z = x
        t0 = time.perf_counter()
        for _ in range(n_iters):
            z = fwd(params, z)
        float(jnp.mean(z.astype(jnp.float32)))  # host sync
        best = min(best, (time.perf_counter() - t0) / n_iters)

    mp_per_s = (batch * h * w) / best / 1e6
    print(json.dumps({
        "metric": "flagship_lgu_inference_512x512_bf16_pallas",
        "value": round(mp_per_s, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mp_per_s / BASELINE_MP_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
