"""Fused LocalNonLinearBlock kernel.

One encoder/decoder block of the flagship
(norm → 1×1 expand → depthwise 3×3 (replicate pad) → σ(m)·m·u gate →
1×1 project → learnable 2-way skip; reference v1x0.py:911-964) executed
as a single Pallas kernel: each row-band makes one pipelined HBM read and
one write; all intermediates live in VMEM; the two 1×1 convs run on the
MXU against VMEM-resident weights.

Design notes (measured on v5e through this rig):
  * Pallas's automatic BlockSpec pipeline moves 512²×48 bf16 at full HBM
    bandwidth (~25 µs); manual make_async_copy halo windows are ~60×
    slower (per-DMA latency) and hit Mosaic lane-alignment limits for
    C<128. So the halo is NOT DMA'd: the band's top/bottom neighbour rows
    are passed as separately blocked inputs (built by two strided slices
    outside the kernel) and concatenated in VMEM.
  * Bands span the full width, so only an H halo is needed and the W/C
    (sublane/lane) dims are never sliced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wshift_replicate(v, d, w, interpret):
    """out[:, j] = v[:, j+d] with edge replication, via an aligned circular
    roll + boundary fix (W-dim slices by ±1 would break 8-sublane alignment
    and force Mosaic relayouts)."""
    if d == 0:
        return v
    if interpret:
        r = jnp.roll(v, -d, axis=1)
    else:
        r = pltpu.roll(v, (-d) % w, axis=1)  # pltpu.roll needs shift ≥ 0
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    edge = w - 1 if d == 1 else 0
    return jnp.where(col == edge, v, r)


def _kernel(x_ref, top_ref, bot_ref, scale_ref, w1_ref, dwk_ref, w2_ref,
            skip_ref, out_ref, *, tile_h, w, c, hidden2, eps, ddof, interpret):
    x = jnp.concatenate([top_ref[0, 0], x_ref[0], bot_ref[0, 0]], axis=0)
    fdtype = jnp.float32

    # CustomLayerNorm: unbiased variance over channels, no mean subtraction.
    # Lane-dim reductions via MXU dots with a ones vector (cross-lane
    # reduces on the VPU are slow).
    ones_c = jnp.ones((c, 1), x.dtype)
    s1 = jax.lax.dot_general(x, ones_c, (((2,), (0,)), ((), ())),
                             preferred_element_type=fdtype)
    s2 = jax.lax.dot_general(x * x, ones_c, (((2,), (0,)), ((), ())),
                             preferred_element_type=fdtype)
    mean = s1 / c
    var = (s2 - c * mean * mean) / (c - ddof)
    inv = jax.lax.rsqrt(var + eps)
    y0 = (x.astype(fdtype) * inv * scale_ref[:].astype(fdtype)).astype(x.dtype)

    # 1×1 expand on the MXU (keep 3D; Mosaic lowers leading dims as M)
    y1 = jax.lax.dot_general(
        y0, w1_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=fdtype,
    )

    # depthwise 3×3: H shifts are free (untiled dim), W shifts via roll
    y1_w = [_wshift_replicate(y1, d, w, interpret) for d in (-1, 0, 1)]
    acc = jnp.zeros((tile_h, w, hidden2), fdtype)
    for a in range(3):
        for b in range(3):
            acc += y1_w[b][a:a + tile_h] * dwk_ref[a, b, :].astype(fdtype)

    # gate σ(m)·m·u
    m = acc[..., : hidden2 // 2]
    u = acc[..., hidden2 // 2:]
    y3 = (jax.nn.sigmoid(m) * m * u).astype(x.dtype)

    # 1×1 project
    y4 = jax.lax.dot_general(
        y3, w2_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=fdtype,
    )

    center = x[1:tile_h + 1].astype(fdtype)
    sk = skip_ref[:].astype(fdtype)
    out_ref[0] = (sk[0] * center + sk[1] * y4).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "ddof", "interpret"))
def fused_gated_block(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    w1: jnp.ndarray,
    dwk: jnp.ndarray,
    w2: jnp.ndarray,
    skip: jnp.ndarray,
    *,
    tile_h: int = 8,
    ddof: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, H, W, C); scale: (C,); w1: (C, 2H); dwk: (3, 3, 2H);
    w2: (H, C); skip: (2,). H must be a multiple of tile_h."""
    bsz, h, w, c = x.shape
    hidden2 = w1.shape[1]
    assert h % tile_h == 0, (h, tile_h)
    n_bands = h // tile_h

    xpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    halo_top = xpad[:, 0:h:tile_h][:, :, None]          # (B, n_bands, 1, W, C)
    halo_bot = xpad[:, tile_h + 1::tile_h][:, :, None]  # (B, n_bands, 1, W, C)

    kernel = functools.partial(
        _kernel, tile_h=tile_h, w=w, c=c, hidden2=hidden2, eps=1e-5, ddof=ddof,
        interpret=interpret,
    )
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dwk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # skip
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,  # v5e has 128M physical VMEM
        ),
        interpret=interpret,
    )(x, halo_top, halo_bot, scale, w1, dwk, w2, skip)


def gated_block_reference(x, scale, w1, dwk, w2, skip, ddof: int = 1):
    """Pure-jnp twin for testing (mirrors blocks.LocalNonLinearBlock)."""
    c = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / (c - ddof)
    y0 = x / jnp.sqrt(var + 1e-5) * scale
    y1 = jnp.einsum("...i,io->...o", y0, w1)
    y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    acc = sum(
        y1p[:, a:a + x.shape[1], b:b + x.shape[2], :] * dwk[a, b]
        for a in range(3) for b in range(3)
    )
    m, u = jnp.split(acc, 2, axis=-1)
    y3 = jax.nn.sigmoid(m) * m * u
    y4 = jnp.einsum("...i,io->...o", y3, w2)
    return skip[0] * x + skip[1] * y4
