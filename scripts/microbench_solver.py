"""Microbenchmark: MixtureGTVGLR solver alone at each flagship scale shape.

Splits the 512^2 flagship frame time into per-scale solver cost so kernel
work can be targeted. Methodology per PERF.md (chained scan + readback).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.solvers.gtv_glr import MixtureGTVGLR


def bench(fn, x, n=20):
    @jax.jit
    def chain(x):
        def body(z, _):
            return fn(z), None
        z, _ = jax.lax.scan(body, x, None, length=n)
        return z

    chain(x).block_until_ready()
    float(jnp.mean(chain(x).astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(chain(x).astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    total = 0.0
    for (h, w, g, c, tag) in [
        (512, 512, 8, 48, "scale0"),
        (256, 256, 16, 96, "scale1"),
        (128, 128, 16, 192, "scale2"),
        (64, 64, 32, 384, "scale3"),
    ]:
        dtype = jnp.bfloat16
        model = MixtureGTVGLR(n_graphs=g, n_node_fts=c // g)
        x32 = jnp.asarray(np.random.RandomState(1).rand(1, h, w, c), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x32)
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        x = x32.astype(dtype)
        fn = lambda z: model.apply(params, z)
        t = bench(fn, x)
        total += t
        print(f"{tag} ({h}x{w} G={g} C={c}): {t*1e3:.3f} ms")
    print(f"total solver time/frame: {total*1e3:.2f} ms")


if __name__ == "__main__":
    main()
