"""Bias-free full-model breakdown: time full forward vs enc_dec (no
filtering), vs encode-only, at batch 1 and 4, using paired in-jit scan
lengths (marginal cost) to remove the ~27ms per-call tunnel overhead.
"""

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
    c0, c1 = make(n0), make(n1)
    out = []
    for c in (c0, c1):
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
    model = AbstractMultiScaleGraphFilter(use_pallas_blocks=True, **flagship_config())
    rng = np.random.RandomState(0)
    for batch in (1,):
        x32 = jnp.asarray(rng.rand(batch, 512, 512, 3).astype(np.float32))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x32)
        params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
        x = x32.astype(jnp.bfloat16)

        t_full = marginal(lambda z: model.apply(params, z), x)
        t_ae = marginal(lambda z: model.apply(params, z, method="enc_dec"), x)
        mp = batch * 0.262144
        print(f"batch={batch}: full {t_full*1e3:.2f} ms ({mp/t_full:.2f} MP/s)  "
              f"enc_dec {t_ae*1e3:.2f} ms  solver-part {(t_full-t_ae)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
