"""Dissect fused_gated_block time: ablate pieces of the kernel (numerics
intentionally wrong for ablated variants — timing only) to find where the
1.5 ms/block at 512^2x48 goes.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wshift(v, d, w, fix):
    if d == 0:
        return v
    r = pltpu.roll(v, (-d) % w, axis=1)
    if not fix:
        return r
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    edge = w - 1 if d == 1 else 0
    return jnp.where(col == edge, v, r)


def _kernel(x_ref, top_ref, bot_ref, scale_ref, w1_ref, dwk_ref, w2_ref,
            skip_ref, out_ref, *, tile_h, w, c, hidden2, opts):
    x = jnp.concatenate([top_ref[0, 0], x_ref[0], bot_ref[0, 0]], axis=0)
    fdtype = jnp.float32
    adtype = jnp.bfloat16 if opts["acc_bf16"] else jnp.float32

    if opts["norm"]:
        ones_c = jnp.ones((c, 1), x.dtype)
        s1 = jax.lax.dot_general(x, ones_c, (((2,), (0,)), ((), ())),
                                 preferred_element_type=fdtype)
        s2 = jax.lax.dot_general(x * x, ones_c, (((2,), (0,)), ((), ())),
                                 preferred_element_type=fdtype)
        mean = s1 / c
        var = (s2 - c * mean * mean) / (c - 1)
        inv = jax.lax.rsqrt(var + 1e-5)
        y0 = (x.astype(fdtype) * inv * scale_ref[:].astype(fdtype)).astype(x.dtype)
    else:
        y0 = x

    y1 = jax.lax.dot_general(
        y0, w1_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=adtype if opts["y1_lowp"] else fdtype,
    )

    if opts["roll"]:
        if opts["y1_lowp"] and opts["acc_bf16"]:
            # bf16 sublane roll: bitcast lane-pairs to int32 is NOT sublane-
            # safe; roll in f32 instead (so y1_lowp+roll is mutually exclusive)
            y1_w = [_wshift(y1.astype(fdtype), d, w, opts["fix"]).astype(adtype)
                    for d in (-1, 0, 1)]
        else:
            y1_w = [_wshift(y1, d, w, opts["fix"]) for d in (-1, 0, 1)]
    else:
        y1_w = [y1, y1, y1]

    acc = jnp.zeros((tile_h, w, hidden2), adtype)
    dwk = dwk_ref[:].astype(adtype)
    for a in range(3):
        for b in range(3):
            acc += y1_w[b][a:a + tile_h].astype(adtype) * dwk[a, b, :]

    m = acc[..., : hidden2 // 2]
    u = acc[..., hidden2 // 2:]
    if opts["gate"]:
        y3 = (jax.nn.sigmoid(m) * m * u).astype(x.dtype)
    else:
        y3 = (m * u).astype(x.dtype)

    y4 = jax.lax.dot_general(
        y3, w2_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=fdtype,
    )

    center = x[1:tile_h + 1].astype(fdtype)
    sk = skip_ref[:].astype(fdtype)
    out_ref[0] = (sk[0] * center + sk[1] * y4).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "optst"))
def run_block(x, scale, w1, dwk, w2, skip, *, tile_h, optst):
    opts = dict(optst)
    bsz, h, w, c = x.shape
    hidden2 = w1.shape[1]
    n_bands = h // tile_h
    xpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    halo_top = xpad[:, 0:h:tile_h][:, :, None]
    halo_bot = xpad[:, tile_h + 1::tile_h][:, :, None]
    kernel = functools.partial(_kernel, tile_h=tile_h, w=w, c=c,
                               hidden2=hidden2, opts=opts)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), x.dtype),
        grid=(bsz, n_bands),
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, halo_top, halo_bot, scale, w1, dwk, w2, skip)


def bench(fn, x, args, n=50):
    @jax.jit
    def chain(x):
        def body(z, _):
            return fn(z, *args), None
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


BASE = dict(norm=True, roll=True, fix=True, gate=True, acc_bf16=False,
            y1_lowp=False)


def main():
    h = w = 512
    c, hidden2 = 48, 192
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.rand(1, h, w, c), dt)
    scale = jnp.asarray(rng.randn(c) * 0.1 + 1.0, dt)
    w1 = jnp.asarray(rng.randn(c, hidden2) / np.sqrt(c), dt)
    dwk = jnp.asarray(rng.randn(3, 3, hidden2) * 0.2, dt)
    w2 = jnp.asarray(rng.randn(hidden2 // 2, c) / np.sqrt(hidden2 // 2), dt)
    skip = jnp.asarray([1.0, 1.0], dt)
    args = (scale, w1, dwk, w2, skip)

    variants = [
        ("base tile8", dict(BASE), 8),
        ("base tile16", dict(BASE), 16),
        ("base tile32", dict(BASE), 32),
        ("no_fix", dict(BASE, fix=False), 8),
        ("no_roll", dict(BASE, roll=False), 8),
        ("no_gate", dict(BASE, gate=False), 8),
        ("no_norm", dict(BASE, norm=False), 8),
        ("acc_bf16", dict(BASE, acc_bf16=True), 8),
        ("acc_bf16+lowp", dict(BASE, acc_bf16=True, y1_lowp=True), 8),
        ("acc_bf16 tile32", dict(BASE, acc_bf16=True), 32),
        ("stripped", dict(BASE, roll=False, fix=False, gate=False,
                          norm=False, acc_bf16=True, y1_lowp=True), 8),
    ]
    for name, opts, th in variants:
        optst = tuple(sorted(opts.items()))
        fn = lambda z, *a: run_block(z, *a, tile_h=th, optst=optst)
        try:
            t = bench(fn, x, args)
            print(f"{name:18s}: {t*1e3:.3f} ms")
        except Exception as e:
            print(f"{name:18s}: FAILED {repr(e)[:160]}")


if __name__ == "__main__":
    main()
