"""Calibrate achievable HBM bandwidth on this chip: XLA copies vs Pallas
copies at several shapes/tilings."""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_chain(fn, x, n=30):
    @jax.jit
    def chain(x):
        def bd(c, _):
            return fn(c), None
        z, _ = jax.lax.scan(bd, x, None, length=n)
        return z
    chain(x).block_until_ready()
    float(jnp.mean(chain(x).astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(chain(x).astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def pallas_copy(x, tile_rows):
    m = x.shape[0]

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.01

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(m // tile_rows,),
        in_specs=[pl.BlockSpec((tile_rows,) + x.shape[1:],
                               lambda i: (i,) + (0,) * (x.ndim - 1),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_rows,) + x.shape[1:],
                               lambda i: (i,) + (0,) * (x.ndim - 1),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def main():
    rng = np.random.RandomState(0)

    cases = [
        ("(4096,4096) f32", np.float32, (4096, 4096)),
        ("(4096,4096) bf16", np.bfloat16 if hasattr(np, "bfloat16") else np.float16, None),
        ("(512,512,192) f32", np.float32, (512, 512, 192)),
        ("(512,512,48) bf16", None, (512, 512, 48)),
        ("(262144,192) f32", np.float32, (262144, 192)),
    ]

    # XLA-level copies
    for name, npdt, shape in cases:
        if shape is None:
            x = jnp.asarray(rng.rand(4096, 4096), jnp.bfloat16)
        elif name.endswith("bf16"):
            x = jnp.asarray(rng.rand(*shape), jnp.bfloat16)
        else:
            x = jnp.asarray(rng.rand(*shape).astype(npdt))
        t = bench_chain(lambda z: z * 1.01, x)
        byts = x.size * x.dtype.itemsize * 2
        print(f"XLA copy {name} ({x.dtype}): {t*1e3:.3f} ms  {byts/t/1e9:.0f} GB/s")

    # Pallas copies, tile sweep
    x = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))
    for tr in (8, 64, 256, 512):
        t = bench_chain(functools.partial(pallas_copy, tile_rows=tr), x)
        byts = x.size * 4 * 2
        print(f"pallas copy (4096,4096) f32 tile{tr}: {t*1e3:.3f} ms  {byts/t/1e9:.0f} GB/s")

    x = jnp.asarray(rng.rand(512, 512, 192).astype(np.float32))
    for tr in (8, 64):
        t = bench_chain(functools.partial(pallas_copy, tile_rows=tr), x)
        byts = x.size * 4 * 2
        print(f"pallas copy (512,512,192) f32 tile{tr}: {t*1e3:.3f} ms  {byts/t/1e9:.0f} GB/s")

    # two-op XLA chain (does a second elementwise pass cost another round trip?)
    t = bench_chain(lambda z: (z * 1.01) + jnp.tanh(z), x)
    byts = x.size * 4 * 3
    print(f"XLA z*1.01+tanh(z) (512,512,192): {t*1e3:.3f} ms ({byts/t/1e9:.0f} GB/s if 3 passes)")


if __name__ == "__main__":
    main()
