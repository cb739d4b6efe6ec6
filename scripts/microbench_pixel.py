"""Pixel-domain family (v6 MultiScaleSequenceDenoiser) on-chip throughput.

Parity for this family is interpret-mode tested (tests/test_solver_chw.py,
tests/test_pixel_family.py); this measures real-TPU throughput at 512² bf16
for the jnp path vs the fused CHW solver path (use_pallas_solver), marginal
method. The v6 config: 24 graphs × 3 node-fts, diamond12 window, 4 CG
iters, n_cnn_fts=72 (reference model_GLR_GTV_deep_v6.py:1041-1082).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.models.pixel import MultiScaleSequenceDenoiser
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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="jnp,nhwc",
                    help="comma list of jnp | chw | nhwc | features "
                         "('features' = the feature U-Net + DC head alone "
                         "via a 0-weight solve — the per-piece accounting "
                         "for VERDICT r4 #4)")
    ap.add_argument("--tile-h", type=int, default=16)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
    x = x32.astype(jnp.bfloat16)
    rows = []
    params = None
    for variant in args.variants.split(","):
        kw = {"jnp": {}, "chw": {"use_pallas_solver": True},
              "nhwc": {"use_nhwc_solver": True},
              "features": {"eval_skip_solve": True}}[variant]
        model = MultiScaleSequenceDenoiser(**kw)
        if params is None:
            # always init the PLAIN model so the param tree is the full
            # one (eval_skip_solve never touches the solver submodules)
            params = jax.jit(MultiScaleSequenceDenoiser().init)(
                jax.random.PRNGKey(0), x32)
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), params)
        t = marginal(lambda z, m=model, p=params: m.apply(p, z), x)
        row = {"model": "pixel_v6", "variant": variant,
               "ms_per_call": round(t * 1e3, 2),
               "mp_per_s": round(0.262144 / t, 2)}
        if variant != "jnp" and "jnp" in args.variants:
            ref = jax.jit(MultiScaleSequenceDenoiser().apply)(params, x)
            got = jax.jit(model.apply)(params, x)
            row["max_dev_vs_jnp"] = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
