"""Isolate TRUE per-iteration cost: t(scan n=110) - t(scan n=10) / 100.
Removes any fixed per-call/per-scan overhead that contaminated earlier
microbenches. Also compares scan-chaining vs python-loop dispatch chaining.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.ops.pallas.gated_block import fused_gated_block


def t_scan(fn, x, n, reps=3):
    @jax.jit
    def chain(x):
        def bd(c, _):
            return fn(c), None
        z, _ = jax.lax.scan(bd, x, None, length=n)
        return z
    chain(x).block_until_ready()
    float(jnp.mean(chain(x).astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.mean(chain(x).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(fn, x, n0=10, n1=110):
    a = t_scan(fn, x, n0)
    b = t_scan(fn, x, n1)
    return (b - a) / (n1 - n0), a / n0


def t_pyloop(fn, x, n=100, reps=3):
    jf = jax.jit(fn)
    jf(x).block_until_ready()
    float(jnp.mean(jf(x).astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        z = x
        t0 = time.perf_counter()
        for _ in range(n):
            z = jf(z)
        float(jnp.mean(z.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    rng = np.random.RandomState(0)

    # 1. copies
    for shape, dt, tag in [
        ((1, 512, 512, 48), jnp.bfloat16, "copy 25MB bf16"),
        ((512, 512, 192), jnp.float32, "copy 201MB f32"),
    ]:
        x = jnp.asarray(rng.rand(*shape), dt)
        m, avg = marginal(lambda z: z * 1.01, x)
        p = t_pyloop(lambda z: z * 1.01, x)
        byts = x.size * x.dtype.itemsize * 2
        print(f"{tag}: marginal {m*1e3:.3f} ms ({byts/m/1e9:.0f} GB/s)  "
              f"scan-avg {avg*1e3:.3f}  pyloop {p*1e3:.3f}")

    # 2. skinny matmul
    a = jnp.asarray(rng.rand(262144, 48), jnp.bfloat16)
    w = jnp.asarray(rng.rand(48, 192), jnp.bfloat16)
    fn = lambda z: jax.lax.dot_general(z, w, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.bfloat16)[:, :48]
    m, avg = marginal(fn, a)
    print(f"matmul M=262k K=48 N=192: marginal {m*1e3:.3f} ms  scan-avg {avg*1e3:.3f}")

    # 3. gated block pallas v1, all scales
    for (h, w_, c, h2, tag) in [
        (512, 512, 48, 192, "block scale0"),
        (256, 256, 96, 384, "block scale1"),
        (128, 128, 192, 768, "block scale2"),
        (64, 64, 384, 1536, "block scale3"),
    ]:
        dt = jnp.bfloat16
        x = jnp.asarray(rng.rand(1, h, w_, c), dt)
        scale = jnp.asarray(rng.randn(c) * 0.1 + 1.0, dt)
        w1 = jnp.asarray(rng.randn(c, h2) / np.sqrt(c), dt)
        dwk = jnp.asarray(rng.randn(3, 3, h2) * 0.2, dt)
        w2 = jnp.asarray(rng.randn(h2 // 2, c) / np.sqrt(h2 // 2), dt)
        skip = jnp.asarray([1.0, 1.0], dt)
        fn = lambda z: fused_gated_block(z, scale, w1, dwk, w2, skip)
        m, avg = marginal(fn, x, n0=10, n1=60)
        print(f"{tag}: marginal {m*1e3:.3f} ms  scan-avg {avg*1e3:.3f}")

    # 4. xla_orig whole block scale0 (for reference)
    def xla_orig(x):
        c = x.shape[-1]
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / (c - 1)
        y0 = x / jnp.sqrt(var + 1e-5) * scale0_
        y1 = jnp.einsum("...i,io->...o", y0, w1_)
        y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        acc = sum(y1p[:, a:a + x.shape[1], b:b + x.shape[2], :] * dwk_[a, b]
                  for a in range(3) for b in range(3))
        mm, u = jnp.split(acc, 2, axis=-1)
        y3 = jax.nn.sigmoid(mm) * mm * u
        y4 = jnp.einsum("...i,io->...o", y3, w2_)
        return x + y4
    dt = jnp.bfloat16
    x = jnp.asarray(rng.rand(1, 512, 512, 48), dt)
    scale0_ = jnp.asarray(rng.randn(48) * 0.1 + 1.0, dt)
    w1_ = jnp.asarray(rng.randn(48, 192) / np.sqrt(48), dt)
    dwk_ = jnp.asarray(rng.randn(3, 3, 192) * 0.2, dt)
    w2_ = jnp.asarray(rng.randn(96, 48) / np.sqrt(96), dt)
    m, avg = marginal(xla_orig, x, n0=10, n1=60)
    print(f"xla_orig block scale0: marginal {m*1e3:.3f} ms  scan-avg {avg*1e3:.3f}")


if __name__ == "__main__":
    main()
