"""Measure MXU strategies for the expand+depthwise composition at scale0.

1. raw lax.conv 3x3 C->2H (K=9C=432), zero-SAME vs pre-padded, f32/bf16 out
2. pallas im2col(9C lanes)+single dot
3. pallas 9-dot accumulate
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, n=50):
    @jax.jit
    def chain(*a):
        def body(c, _):
            out = fn(*((c,) + a[1:]))
            # reduce channel dim back to input channels for chaining
            cdim = c.shape[-1]
            out = out[..., :cdim].astype(c.dtype)
            return out, None
        z, _ = jax.lax.scan(body, a[0], None, length=n)
        return z
    chain(*args).block_until_ready()
    float(jnp.mean(chain(*args).astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(chain(*args).astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


H = W = 512
C, H2 = 48, 192


def conv_same(x, k, odt):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=odt)


def conv_padded(x, k, odt):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=odt)


# ---- pallas im2col + one dot ----

def _kernel_im2col(x_ref, top_ref, bot_ref, wk_ref, out_ref, *, tile_h, w, c, h2):
    x = jnp.concatenate([top_ref[0, 0], x_ref[0], bot_ref[0, 0]], axis=0)
    xf = x.astype(jnp.float32)  # pltpu.roll is 32-bit-only
    cols = []
    for b in (-1, 0, 1):
        if b == 0:
            xv = x
        else:
            r = pltpu.roll(xf, (-b) % w, axis=1)
            col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            edge = w - 1 if b == 1 else 0
            xv = jnp.where(col == edge, xf, r).astype(x.dtype)
        for a in range(3):
            cols.append(xv[a:a + tile_h])
    xc = jnp.concatenate(cols, axis=-1)  # (tile_h, w, 9C)
    out_ref[0] = jax.lax.dot_general(
        xc, wk_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h",))
def pallas_im2col(x, wk, *, tile_h=8):
    bsz, h, w, c = x.shape
    h2 = wk.shape[1]
    n_bands = h // tile_h
    xpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    halo_top = xpad[:, 0:h:tile_h][:, :, None]
    halo_bot = xpad[:, tile_h + 1::tile_h][:, :, None]
    kern = functools.partial(_kernel_im2col, tile_h=tile_h, w=w, c=c, h2=h2)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, h2), x.dtype),
        grid=(bsz, n_bands),
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, h2), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, halo_top, halo_bot, wk)


# ---- pallas 9 dots ----

def _kernel_9dot(x_ref, top_ref, bot_ref, wk_ref, out_ref, *, tile_h, w, c, h2):
    x = jnp.concatenate([top_ref[0, 0], x_ref[0], bot_ref[0, 0]], axis=0)
    xf = x.astype(jnp.float32)
    acc = jnp.zeros((tile_h, w, h2), jnp.float32)
    i = 0
    for b in (-1, 0, 1):
        if b == 0:
            xv = x
        else:
            r = pltpu.roll(xf, (-b) % w, axis=1)
            col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            edge = w - 1 if b == 1 else 0
            xv = jnp.where(col == edge, xf, r).astype(x.dtype)
        for a in range(3):
            acc = acc + jax.lax.dot_general(
                xv[a:a + tile_h], wk_ref[i], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            i += 1
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h",))
def pallas_9dot(x, wk9, *, tile_h=8):
    bsz, h, w, c = x.shape
    h2 = wk9.shape[2]
    n_bands = h // tile_h
    xpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    halo_top = xpad[:, 0:h:tile_h][:, :, None]
    halo_bot = xpad[:, tile_h + 1::tile_h][:, :, None]
    kern = functools.partial(_kernel_9dot, tile_h=tile_h, w=w, c=c, h2=h2)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, h2), x.dtype),
        grid=(bsz, n_bands),
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, h2), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, halo_top, halo_bot, wk9)


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.rand(1, H, W, C), dt)
    k = jnp.asarray(rng.randn(3, 3, C, H2) * 0.1, dt)

    for odt, tag in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        t1 = bench(lambda z: conv_same(z, k, odt), x)
        t2 = bench(lambda z: conv_padded(z, k, odt), x)
        print(f"xla conv K=432 out={tag}: SAME {t1*1e3:.3f} ms   edge-padded {t2*1e3:.3f} ms")

    wk = jnp.asarray(
        np.transpose(np.asarray(k, np.float32), (1, 0, 2, 3)).reshape(9 * C, H2), dt)
    # im2col column order: b-major then a: cols[(b+1)*3+a] = x[a+..., w+b, :]
    # wk rows must be [b, a, c] order
    wk_ba = jnp.asarray(
        np.transpose(np.asarray(k, np.float32), (1, 0, 2, 3)).reshape(9 * C, H2), dt)
    for th in (8, 16, 32):
        try:
            t3 = bench(lambda z: pallas_im2col(z, wk_ba, tile_h=th), x)
            print(f"pallas im2col+dot tile{th}: {t3*1e3:.3f} ms")
        except Exception as e:
            print(f"pallas im2col tile{th} FAILED {repr(e)[:140]}")
    wk9 = jnp.asarray(
        np.transpose(np.asarray(k, np.float32), (1, 0, 2, 3)).reshape(9, C, H2), dt)
    for th in (8, 32):
        try:
            t4 = bench(lambda z: pallas_9dot(z, wk9, tile_h=th), x)
            print(f"pallas 9dot tile{th}: {t4*1e3:.3f} ms")
        except Exception as e:
            print(f"pallas 9dot tile{th} FAILED {repr(e)[:140]}")

    # numerics: compare pallas paths against padded conv
    ref = conv_padded(x, k, jnp.float32)
    a = pallas_im2col(x, wk_ba).astype(jnp.float32)
    b = pallas_9dot(x, wk9).astype(jnp.float32)
    print("im2col err:", float(jnp.max(jnp.abs(ref - a))),
          " 9dot err:", float(jnp.max(jnp.abs(ref - b))))


if __name__ == "__main__":
    main()
