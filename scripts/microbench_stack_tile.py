"""A/B the stacked flat-lane block kernel's tile height at scale0.

The stack's halo-recompute tax is (th+2K)/th — 1.25× at th=32, K=4. At
th=64 the tax drops to 1.125×; VMEM peaks ≈ hidden2·(th+2K)·W·4 B ≈ 28 MB
per live f32 array (y1/acc), within the 100 MB budget. Measures scale0
(512²×48, K=4) at th ∈ {32, 64} plus the NHWC per-block kernel for
context, marginal method.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.ops.pallas.block_stack import fused_block_stack, pack_block_params
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
    rng = np.random.RandomState(0)
    c, h2, k = 48, 192, 4
    params = [dict(
        scale=rng.randn(c).astype(np.float32) * 0.1 + 1.0,
        w1=(rng.randn(c, h2) / np.sqrt(c)).astype(np.float32),
        dwk=(rng.randn(3, 3, h2) * 0.2).astype(np.float32),
        w2=(rng.randn(h2 // 2, c) / np.sqrt(h2 // 2)).astype(np.float32),
        skip=np.array([1.0, 0.8], np.float32)) for _ in range(k)]
    packed = pack_block_params(params, jnp.bfloat16)
    x = jnp.asarray(rng.rand(1, c, 512, 512), jnp.bfloat16)

    for dw_mxu in (False, True):
        for th in (32, 64):
            t = marginal(lambda z, th=th, m=dw_mxu: fused_block_stack(
                z, *packed, tile_h=th, dw_mxu=m), x)
            print(f"scale0 stack K={k} th={th} dw_mxu={dw_mxu}: {t*1e3:6.2f} ms "
                  f"({t/k*1e3:.3f} ms/blk)", flush=True)


if __name__ == "__main__":
    main()
