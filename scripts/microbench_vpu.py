"""Measure VPU characteristics in Pallas on this chip:
- peak elementwise FMA throughput (aligned, f32 vs bf16)
- cost of sublane-misaligned slices (the 9-tap pattern)
- cost of pltpu.roll
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 512, 512, 192
TH = 8


def make_call(body, n_in=1, tile=(TH, W, C)):
    def kernel(*refs):
        body(*refs)

    @jax.jit
    def run(*xs):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(xs[0].shape, xs[0].dtype),
            grid=(H // TH,),
            in_specs=[pl.BlockSpec((TH, W, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec((TH, W, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*xs)
    return run


def bench(run, *xs, n0=10, n1=60):
    """Marginal cost per iteration via paired scan lengths (removes the
    ~27 ms fixed per-call tunnel cost)."""
    def t_at(n):
        @jax.jit
        def chain(*a):
            def bd(c, _):
                return run(*((c,) + a[1:])).astype(c.dtype), None
            z, _ = jax.lax.scan(bd, a[0], None, length=n)
            return z
        chain(*xs).block_until_ready()
        float(jnp.mean(chain(*xs).astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.mean(chain(*xs).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t_at(n1) - t_at(n0)) / (n1 - n0)


def main():
    rng = np.random.RandomState(0)

    for dt, name in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        x = jnp.asarray(rng.rand(H, W, C), dt)

        # 1. peak FMA: out = sum of 9 scaled copies of x (aligned, no shifts)
        def body_fma(x_ref, o_ref):
            v = x_ref[:]
            acc = v * 1.01
            for i in range(8):
                acc = acc + v * (1.0 + i * 0.01)
            o_ref[:] = acc
        t = bench(make_call(body_fma), x)
        ops = H * W * C * 17  # 9 mul + 8 add
        print(f"{name} aligned 9-tap FMA (no shift): {t*1e3:.3f} ms  "
              f"{ops/t/1e12:.2f} Tops/s")

        # 2. with misaligned sublane slices (the real 9-tap pattern)
        def body_slice(x_ref, h_ref, o_ref):
            v = jnp.concatenate([h_ref[:2], x_ref[:]], axis=0)  # th+2 rows
            acc = jnp.zeros((TH, W, C), dt)
            for a in range(3):
                for b in range(3):
                    acc = acc + v[a:a + TH] * (1.0 + a * 0.01 + b)
            o_ref[:] = acc

        @jax.jit
        def run_slice(x, h):
            return pl.pallas_call(
                body_slice,
                out_shape=jax.ShapeDtypeStruct((H, W, C), dt),
                grid=(H // TH,),
                in_specs=[
                    pl.BlockSpec((TH, W, C), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2, W, C), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TH, W, C), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x, h)
        h2 = jnp.asarray(rng.rand(2, W, C), dt)
        t = bench(run_slice, x, h2)
        ops = H * W * C * 18
        print(f"{name} 9-tap with misaligned slices: {t*1e3:.3f} ms  "
              f"{ops/t/1e12:.2f} Tops/s")

        # 3. three rolls only
        if dt == jnp.float32:
            def body_roll(x_ref, o_ref):
                v = x_ref[:]
                r1 = pltpu.roll(v, 1, axis=1)
                r2 = pltpu.roll(v, W - 1, axis=1)
                o_ref[:] = v + r1 + r2
            t = bench(make_call(body_roll), x)
            print(f"{name} 2 rolls + 2 adds: {t*1e3:.3f} ms")

        # 4. pure copy in/out (I/O floor)
        def body_copy(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 1.01
        t = bench(make_call(body_copy), x)
        byts = H * W * C * (4 if dt == jnp.float32 else 2) * 2
        print(f"{name} copy*scale: {t*1e3:.3f} ms  {byts/t/1e9:.0f} GB/s")

        # 5. sigmoid cost
        def body_sig(x_ref, o_ref):
            o_ref[:] = jax.nn.sigmoid(x_ref[:])
        t = bench(make_call(body_sig), x)
        print(f"{name} sigmoid: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
