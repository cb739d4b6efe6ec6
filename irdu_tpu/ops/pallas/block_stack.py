"""Stacked flat-lane CHW kernel for LocalNonLinearBlock runs.

Executes K consecutive encoder/decoder blocks of the flagship
(norm → 1×1 expand → depthwise 3×3 replicate → σ(m)·m·u gate → 1×1
project → learnable 2-way skip; reference
/root/reference/exploration/GGTV_GGLR_v1.0/deep_multiscale_GGLR_GGTV_v1x0.py:911-964)
in ONE pallas_call, with all intermediates resident in VMEM.

Why this layout (measured on v5e, PERF.md):
  * The NHWC per-block kernel (ops/pallas/gated_block.py) puts C on the
    128-wide lane dimension; at the flagship's scale-0/1 dims (C=48/96)
    most VPU lanes idle. Here activations are 2D ``(C, rows·W)`` blocks —
    channels on sublanes, flattened space on lanes — so every elementwise
    op runs at full lane occupancy regardless of C.
  * Both 1×1 convs become plain 2D MXU dots ``(out, C) × (C, rows·W)``
    with a huge N dimension.
  * The depthwise 3×3's H-shifts are ±W *lane* offsets. Each stacked
    block consumes one halo row per side, so its 9 taps are 128-aligned
    lane slices of the W-shifted hidden array — no rolls, no selects.
  * One pallas_call per K-block stack amortizes the ~0.13 ms fixed cost
    per call on this rig and skips K−1 HBM round-trips of the activation.

Boundary semantics (exact, matching replicate pad):
  * Block 1's halo rows are gathered with clamped row indices — identical
    to replicate padding of the raw input.
  * Blocks ≥ 2 need the *derived* array's own edge row replicated
    (recomputing on clamped input rows differs — see ops/pallas/solver_chw
    notes). Before each stacked block, out-of-image halo rows are rebuilt
    by iteratively propagating the true edge row outward (masked lane
    rolls, applied only on the first/last row band).
  * W boundaries use precomputed column masks (numpy constants — no
    in-kernel mod), replicating the edge column.

Constraints: W % 128 == 0 and H % 8 == 0. The flagship's 64-wide scale 3
stays on the NHWC kernel, where C=384 already fills the lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM = 112 * 1024 * 1024  # v5e has 128 MB physical; th=64 needs ~104 MB


def _roll(v, s, interpret):
    """np.roll(v, s, axis=-1) (out[l] = v[l-s]) on the lane dim."""
    if interpret:
        return jnp.roll(v, s, axis=-1)
    return pltpu.roll(v, s % v.shape[-1], axis=v.ndim - 1)


def _kernel(x_ref, xh_ref, col_ref, scale_ref, w1_ref, dwk_ref, m9_ref,
            w2_ref, skip_ref, out_ref, *, n_blocks, tile_h, w, c, hidden2,
            eps, ddof, dw_mxu, interpret):
    """One row band through all K blocks. Arrays are (channels, lanes) with
    lanes = rows·W; row r, column j of the band sits at lane r·W + j."""
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    k_halo = n_blocks
    fdtype = jnp.float32

    xh = xh_ref[0, 0]
    x = jnp.concatenate(
        [xh[:, : k_halo * w], x_ref[0], xh[:, k_halo * w:]], axis=-1,
    ).astype(fdtype)                       # (C, (tile_h + 2K)·W)

    col = col_ref[:]                       # (1, E_max) int32: lane % W
    ones_c = None

    for k in range(n_blocks):
        e_in = (tile_h + 2 * (k_halo - k)) * w
        e_out = e_in - 2 * w

        if k > 0:
            # Rebuild out-of-image halo rows of the derived signal: on the
            # first/last band, propagate the true edge row outward, one row
            # per iteration (rows −1…−m take the value of the row below).
            m = k_halo - k
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, e_in), 1)
            top_bad = (lane < m * w) & (i == 0)
            bot_bad = (lane >= e_in - m * w) & (i == nb - 1)
            for _ in range(m):
                x = jnp.where(top_bad, _roll(x, -w, interpret), x)
                x = jnp.where(bot_bad, _roll(x, w, interpret), x)

        # CustomLayerNorm: unbiased variance over channels, no mean
        # subtraction (reference v1x0.py:911-925). Channel reductions via
        # MXU ones-dots; C sits on sublanes.
        xb = x.astype(out_ref.dtype)
        if ones_c is None or ones_c.shape[1] != c:
            ones_c = jnp.ones((1, c), xb.dtype)
        s1 = jax.lax.dot_general(ones_c, xb, (((1,), (0,)), ((), ())),
                                 preferred_element_type=fdtype)
        s2 = jax.lax.dot_general(ones_c, (x * x).astype(xb.dtype),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=fdtype)
        mean = s1 / c
        var = (s2 - c * mean * mean) / (c - ddof)
        inv = jax.lax.rsqrt(var + eps)                       # (1, E)
        y0f = x * inv * scale_ref[k]                         # (C, E) f32
        y0 = y0f.astype(xb.dtype)

        if dw_mxu:
            # Fused expand ⊗ depthwise on the MXU: since the depthwise tap
            # scale is per-output-channel, z_c(p) = Σ_t k_c(t)·(W1ᵀy0)(p+t)_c
            # = Σ_t (diag(k(t))·W1ᵀ) y0(p+t) — nine (2H, C) × (C, E) dots
            # against shifted y0 slices, with the tap matrices
            # m9[t] = w1ᵀ ⊙ dwk[t] precomputed at pack time. Moves the
            # 9·2H·E FMAs (the VPU-bound bulk of the block — PERF.md) onto
            # the MXU; pays 9× the expand FLOPs, a win only while
            # 9·2·C·2H·E / MXU_rate < 9·2H·E / VPU_rate, i.e. C ≲ 64.
            # W-shifts happen on the f32 y0 (pltpu.roll is 32-bit-only),
            # then each column variant casts to bf16 once.
            y0v = []
            for b in range(3):
                if b == 0:
                    yb = jnp.where(col[:, :e_in] == 0, y0f,
                                   _roll(y0f, 1, interpret))
                elif b == 2:
                    yb = jnp.where(col[:, :e_in] == w - 1, y0f,
                                   _roll(y0f, -1, interpret))
                else:
                    yb = y0f
                y0v.append(yb.astype(xb.dtype))
            acc = jnp.zeros((hidden2, e_out), fdtype)
            for a in range(3):
                for b in range(3):
                    tap = y0v[b][:, a * w: a * w + e_out]
                    acc = acc + jax.lax.dot_general(
                        m9_ref[k, a * 3 + b], tap, (((1,), (0,)), ((), ())),
                        preferred_element_type=fdtype)
        else:
            # 1×1 expand on the MXU: (2H, C) × (C, E). Stays f32: the
            # W-shifts below are pltpu.roll, which is 32-bit-only (PERF.md
            # Mosaic constraints) — bf16 here fails to lower.
            y1 = jax.lax.dot_general(w1_ref[k], y0, (((1,), (0,)), ((), ())),
                                     preferred_element_type=fdtype)

            # depthwise 3×3, replicate pad. W-shifts: one lane roll + edge-
            # column fix; H-shifts: 128-aligned lane slices (consume halo).
            acc = jnp.zeros((hidden2, e_out), fdtype)
            for b in range(3):
                if b == 0:
                    y1b = jnp.where(col[:, :e_in] == 0, y1,
                                    _roll(y1, 1, interpret))
                elif b == 2:
                    y1b = jnp.where(col[:, :e_in] == w - 1, y1,
                                    _roll(y1, -1, interpret))
                else:
                    y1b = y1
                for a in range(3):
                    tap = y1b[:, a * w: a * w + e_out]
                    acc = acc + tap * dwk_ref[k, a * 3 + b]

        # gate σ(m)·m·u (reference v1x0.py:941-944)
        m_half = acc[: hidden2 // 2]
        u_half = acc[hidden2 // 2:]
        y3 = (jax.nn.sigmoid(m_half) * m_half * u_half).astype(xb.dtype)

        # 1×1 project: (C, H) × (H, E)
        y4 = jax.lax.dot_general(w2_ref[k], y3, (((1,), (0,)), ((), ())),
                                 preferred_element_type=fdtype)

        x = skip_ref[k, 0] * x[:, w: w + e_out] + skip_ref[k, 1] * y4

    out_ref[0] = x.astype(out_ref.dtype)


def _pick_tile(h, w, c, hidden2, n_blocks):
    """Row-band height: the halo recompute waste (tile+2K)/tile dominates
    runtime, so prefer the TALLEST band that divides H and fits VMEM
    (measured at 512²×48 K=4: th=8 → 4.09 ms, th=16 → 3.15, th=32 → 2.61,
    th=64 → 2.45 vs 3.21 for per-block NHWC). The price is Mosaic compile
    time (≈2 min per distinct shape, persistent-cached). The VMEM estimate
    is calibrated against the compiler's scoped-allocation report at
    th=64/W=512/C=48: three f32 (hidden2, E) arrays (y1, its shifted copy,
    acc) + the f32 (C, E) iterate + double-buffered bf16 in/out blocks."""
    for th in (64, 32, 16, 8):
        if h % th != 0:
            continue
        lanes = (th + 2 * n_blocks) * w
        # estimate ≤ the 112 MB kernel limit minus headroom; the estimate
        # runs ~3% above the compiler's scoped report (106.2 MB estimated
        # vs 103.5 MB reported at th=64/W=512/C=48 — which must qualify)
        if lanes * (3 * hidden2 * 4 + 12 * c) <= 108 * 1024 * 1024:
            return th
    return None


def _halo_rows_idx(h, tile_h, halo):
    nb = h // tile_h
    idx = np.concatenate([
        np.arange(nb)[:, None] * tile_h + np.arange(-halo, 0)[None, :],
        np.arange(nb)[:, None] * tile_h + tile_h + np.arange(0, halo)[None, :],
    ], axis=1)
    return jnp.asarray(np.clip(idx, 0, h - 1).reshape(-1))


def stack_ok(shape, n_blocks) -> bool:
    """(B, C, H, W) eligibility for the flat-lane stacked kernel."""
    _, c, h, w = shape
    return (w % 128 == 0 and h % 8 == 0 and c % 8 == 0
            and _pick_tile(h, w, c, 4 * c, n_blocks) is not None)


@functools.partial(jax.jit,
                   static_argnames=("ddof", "interpret", "tile_h", "dw_mxu"))
def fused_block_stack(x, scales, w1t, dwk, w2t, skips, *, ddof: int = 1,
                      tile_h: int | None = None, dw_mxu: bool = False,
                      interpret: bool = False):
    """Run K LocalNonLinearBlocks over x: (B, C, H, W).

    scales: (K, C, 1) f32 — norm per-channel scale;
    w1t:    (K, 2H, C)   — expand weights, transposed (model stores (C, 2H));
    dwk:    (K, 9, 2H, 1) f32 — depthwise taps, t = a·3 + b;
    w2t:    (K, C, H)    — project weights, transposed;
    skips:  (K, 2) f32   — the learnable 2-way skip.

    dw_mxu: fold the expand into the depthwise taps and run both as nine
    MXU dots per block. Measured SLOWER on-chip even at the flagship's
    smallest C=48 scale (0.81 vs 0.61 ms/blk at th=64 — PERF.md): the 9×
    expand-FLOP tax exceeds the VPU tap-FMA cost it removes. Kept as a
    parity-tested negative result; default False (VPU tap path).
    """
    bsz, c, h, w = x.shape
    k_blocks, hidden2 = w1t.shape[0], w1t.shape[1]
    th = tile_h or _pick_tile(h, w, c, hidden2, k_blocks)
    assert th is not None and w % 128 == 0, (h, w)
    nb = h // th
    e_max = (th + 2 * k_blocks) * w

    x2 = x.reshape(bsz, c, h * w)
    xh = jnp.take(x, _halo_rows_idx(h, th, k_blocks), axis=2)
    xh = jnp.transpose(xh.reshape(bsz, c, nb, 2 * k_blocks * w), (0, 2, 1, 3))

    colv = jnp.asarray((np.arange(e_max) % w).reshape(1, -1), jnp.int32)
    # tap matrices m9[k, t] = w1ᵀ[k] ⊙ dwk[k, t]: the expand matmul folded
    # into each depthwise tap (see _kernel). Tiny (K·9·2H·C); built at
    # trace time from the packed operands.
    m9 = (w1t[:, None].astype(jnp.float32) * dwk).astype(x.dtype)

    kernel = functools.partial(
        _kernel, n_blocks=k_blocks, tile_h=th, w=w, c=c, hidden2=hidden2,
        eps=1e-5, ddof=ddof, dw_mxu=dw_mxu, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, c, th * w), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, 2 * k_blocks * w),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # colv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scales
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1t
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dwk
            pl.BlockSpec(memory_space=pltpu.VMEM),   # m9
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2t
            pl.BlockSpec(memory_space=pltpu.SMEM),   # skips
        ],
        out_specs=pl.BlockSpec((1, c, th * w), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(x2, xh, colv, scales, w1t, dwk, m9, w2t, skips)
    return out.reshape(bsz, c, h, w)


def pack_block_params(params_list, dtype):
    """Per-block dicts {scale (C,), w1 (C, 2H), dwk (3, 3, 2H),
    w2 (H, C), skip (2,)} → the stacked operand tuple."""
    scales = jnp.stack([jnp.asarray(p["scale"], jnp.float32)[:, None]
                        for p in params_list])
    w1t = jnp.stack([jnp.asarray(p["w1"], dtype).T for p in params_list])
    dwk = jnp.stack([
        jnp.asarray(p["dwk"], jnp.float32).reshape(9, -1)[:, :, None]
        for p in params_list])
    w2t = jnp.stack([jnp.asarray(p["w2"], dtype).T for p in params_list])
    skips = jnp.stack([jnp.asarray(p["skip"], jnp.float32)
                       for p in params_list])
    return scales, w1t, dwk, w2t, skips


def block_stack_reference(x_chw, params_list, ddof: int = 1):
    """Pure-jnp twin (NHWC gated_block_reference per block, CHW in/out)."""
    from irdu_tpu.ops.pallas.gated_block import gated_block_reference

    x = jnp.transpose(x_chw, (0, 2, 3, 1))
    for p in params_list:
        x = gated_block_reference(x, p["scale"], p["w1"], p["dwk"],
                                  p["w2"], p["skip"], ddof=ddof)
    return jnp.transpose(x, (0, 3, 1, 2))
