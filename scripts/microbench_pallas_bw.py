"""Pallas copy bandwidth vs block shape/dtype, and VPU rate via FMA-depth
sweep (marginal methodology)."""
from __future__ import annotations
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def marginal(run, x, n0=10, n1=60):
    def t_at(n):
        @jax.jit
        def chain(a):
            def bd(c, _):
                return run(c).astype(c.dtype), None
            z, _ = jax.lax.scan(bd, a, None, length=n)
            return z
        chain(x).block_until_ready()
        float(jnp.mean(chain(x).astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.mean(chain(x).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t_at(n1) - t_at(n0)) / (n1 - n0)


def copy_call(shape, dt, th):
    h, w, c = shape
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.01
    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dt),
            grid=(h // th,),
            in_specs=[pl.BlockSpec((th, w, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((th, w, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)
    return run


def fma_call(shape, dt, th, depth):
    h, w, c = shape
    def kernel(x_ref, o_ref):
        v = x_ref[:]
        acc = v
        for i in range(depth):
            acc = acc * 1.000001 + v
        o_ref[:] = acc
    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dt),
            grid=(h // th,),
            in_specs=[pl.BlockSpec((th, w, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((th, w, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)
    return run


def main():
    rng = np.random.RandomState(0)

    print("== copy bandwidth sweep ==")
    for shape, dt, th in [
        ((512, 512, 128), jnp.bfloat16, 8),
        ((512, 512, 128), jnp.bfloat16, 32),
        ((512, 512, 128), jnp.bfloat16, 128),
        ((512, 512, 256), jnp.bfloat16, 64),
        ((512, 512, 192), jnp.bfloat16, 64),
        ((512, 512, 48),  jnp.bfloat16, 64),
        ((512, 512, 128), jnp.float32, 64),
        ((4096, 4096, 8), jnp.bfloat16, 512),
    ]:
        x = jnp.asarray(rng.rand(*shape), dt)
        t = marginal(copy_call(shape, dt, th), x)
        byts = x.size * x.dtype.itemsize * 2
        print(f"copy {shape} {dt.__name__} th={th}: {t*1e3:.3f} ms  {byts/t/1e9:.0f} GB/s")

    print("== XLA copy reference ==")
    for shape, dt in [((512, 512, 128), jnp.bfloat16), ((512, 512, 48), jnp.bfloat16)]:
        x = jnp.asarray(rng.rand(*shape), dt)
        t = marginal(lambda z: z * 1.01, x)
        byts = x.size * x.dtype.itemsize * 2
        print(f"xla copy {shape}: {t*1e3:.3f} ms  {byts/t/1e9:.0f} GB/s")

    print("== FMA depth sweep (512,512,128) ==")
    for dt in (jnp.float32, jnp.bfloat16):
        for depth in (8, 32, 128, 512):
            shape = (512, 512, 128)
            x = jnp.asarray(rng.rand(*shape), dt)
            t = marginal(fma_call(shape, dt, 64, depth), x)
            ops = x.size * depth * 2
            print(f"fma {dt.__name__} depth={depth}: {t*1e3:.3f} ms  {ops/t/1e12:.2f} Tops/s")


if __name__ == "__main__":
    main()
