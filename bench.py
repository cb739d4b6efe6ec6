"""Benchmark: flagship (LGU) inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "megapixels/sec/chip", "vs_baseline": N}

Baseline: the reference PyTorch model runs 512×512 color inference in
~0.37 s on its GPU ≈ 0.71 MP/s (BASELINE.md; GGTV_GGLR_v1.0/README.ipynb
cell 12/16 outputs). vs_baseline is our MP/s divided by that.

Methodology (PERF.md "round-2 measurement recalibration"): this rig has a
~27 ms fixed cost per blocked jitted call through the remote-execution
tunnel, and `block_until_ready` alone can return before compute finishes.
So the steady-state per-frame cost is measured as a *marginal*: time a
data-dependent `lax.scan` chain of the forward at two lengths (with a
host readback of a scalar derived from the result, which cannot lie) and
take the slope. Best of several repetitions; the two scan programs hit
the persistent compile cache after the first run.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MP_PER_S = 0.71


def _chain(fwd, params, n):
    # The scalar readback is INSIDE the jit: an eager jnp.mean dispatched
    # after a pallas-heavy chain intermittently stalls minutes on this rig.
    @jax.jit
    def run(z):
        def body(c, _):
            return fwd(params, c), None
        out, _ = jax.lax.scan(body, z, None, length=n)
        return jnp.mean(out.astype(jnp.float32))
    return run


def marginal_seconds(fwd, params, x, n0=3, n1=13, reps=3):
    times = []
    for n in (n0, n1):
        run = _chain(fwd, params, n)
        float(run(x))                                    # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x))                                # host readback sync
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return (times[1] - times[0]) / (n1 - n0)


def main():
    from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config
    from irdu_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    # inference config: bf16 params/activations + fused Pallas gated-block
    # and CHW solver kernels
    model = AbstractMultiScaleGraphFilter(
        use_pallas_blocks=True, use_pallas_solver=True, **flagship_config())

    h = w = 512
    batch = 1
    x32 = jnp.asarray(np.random.RandomState(0).rand(batch, h, w, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x32)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    x = x32.astype(jnp.bfloat16)

    # two independent estimates; report the best (they should agree within
    # a few percent — PERF.md tracks the spread)
    t = min(marginal_seconds(model.apply, params, x) for _ in range(2))

    mp_per_s = (batch * h * w) / t / 1e6
    print(json.dumps({
        "metric": "flagship_lgu_inference_512x512_bf16_pallas",
        "value": round(mp_per_s, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mp_per_s / BASELINE_MP_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
