"""Time each LocalLowpassFilteringBlock of the real flagship (bf16 params)
standalone, marginal method — to reconcile standalone vs in-model solver
cost (in-model full-enc_dec delta is ~33ms; op sums say ~5-8ms)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config


def marginal(fn, x, n0=3, n1=13, reps=3):
    def make(n):
        @jax.jit
        def chain(x):
            def bd(c, _):
                return fn(c), None
            z, _ = jax.lax.scan(bd, x, None, length=n)
            return z
        return chain
    out = []
    for c in (make(n0), make(n1)):
        c(x).block_until_ready()
        float(jnp.mean(c(x).astype(jnp.float32)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.mean(c(x).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        out.append(best)
    return (out[1] - out[0]) / (n1 - n0)


def main():
    model = AbstractMultiScaleGraphFilter(use_pallas_blocks=True, use_pallas_solver=True, **flagship_config())
    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x32)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    dims = (48, 96, 192, 384)
    total = 0.0
    for s in range(4):
        hw = 512 >> s
        xs = jnp.asarray(rng.rand(1, hw, hw, dims[s]), jnp.bfloat16)

        def filt(z, s=s):
            return model.apply(params, z,
                               method=lambda m, z: m.local_filters[s](z))
        t = marginal(filt, xs)
        total += t
        print(f"filter scale{s} ({hw}^2 x {dims[s]}): {t*1e3:.2f} ms")
    print(f"sum: {total*1e3:.2f} ms")

    # and the filtering method end-to-end on real codes
    codes = model.apply(params, x32.astype(jnp.bfloat16), method="encode")
    codes = jax.tree_util.tree_map(jax.lax.stop_gradient, codes)

    def filtering(c0):
        cs = (c0,) + tuple(codes[1:])
        return model.apply(params, cs, method="filtering")[0]
    t = marginal(filtering, codes[0])
    print(f"filtering(4 scales, in one jit): {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
