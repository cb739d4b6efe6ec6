"""Batch-size throughput sweep across the model family (marginal method).

The high-throughput end of the PSNR-vs-MP/s curve (lite/micro configs,
PERF.md) is overhead-bound, not FLOP-bound: per-pallas_call (~0.13 ms) and
per-op fixed costs dominate at small C. Batching amortizes exactly those
costs — PSNR is untouched (same weights, same per-image math; the protocol
PSNRs in PERF.md's table apply verbatim), so a batched deployment moves
the curve's throughput axis for free.

Measures MP/s at 512² for {flagship, lite, micro} × eval_cg_iters {3, 1}
× batch {1, 4, 8} on the bf16 fast path (use_pallas_blocks +
use_pallas_solver). Throughput only — weights are random init (identical
compute graph to the trained checkpoint).
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.models.flagship import (
    AbstractMultiScaleGraphFilter,
    flagship_config,
    flagship_lite_config,
    flagship_micro_config,
)
from irdu_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()


def marginal(fn, x, n0=3, n1=13, reps=3):
    def make(n):
        @jax.jit
        def chain(z):
            def bd(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(bd, z, None, length=n)
            return jnp.mean(out.astype(jnp.float32))
        return chain
    ts = []
    for c in (make(n0), make(n1)):
        float(c(x))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(c(x))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (n1 - n0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="micro,lite,flagship")
    ap.add_argument("--cg", default="1,3")
    ap.add_argument("--batches", default="1,4,8")
    args = ap.parse_args()

    cfgs = {"flagship": flagship_config, "lite": flagship_lite_config,
            "micro": flagship_micro_config}
    rng = np.random.RandomState(0)
    rows = []
    for name in args.models.split(","):
        cfg = cfgs[name]()
        params = None
        for k in (int(s) for s in args.cg.split(",")):
            model = AbstractMultiScaleGraphFilter(
                use_pallas_blocks=True, use_pallas_solver=True,
                eval_cg_iters=k, **cfg)
            if params is None:
                x1 = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
                params = jax.jit(model.init)(jax.random.PRNGKey(0), x1)
                params = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16), params)
            for b in (int(s) for s in args.batches.split(",")):
                xb = jnp.asarray(rng.rand(b, 512, 512, 3).astype(np.float32)
                                 ).astype(jnp.bfloat16)
                t = marginal(lambda z, m=model: m.apply(params, z), xb)
                row = {"model": name, "cg": k, "batch": b,
                       "ms_per_call": round(t * 1e3, 2),
                       "mp_per_s": round(b * 0.262144 / t, 2)}
                rows.append(row)
                print(json.dumps(row), flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
