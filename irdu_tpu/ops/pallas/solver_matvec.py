"""Fused single-scale GGTV+GGLR system matvec kernel.

Computes  out = x + μ⊙GLR(x) + ρ⊙GTV(x)  (one scale of the solver's
`apply_lightweight_transformer`, reference v1x0.py:642-682) in ONE pass:
stats stencil, Laplacian matvec, graph gradient/divergence, transposed
stencils — all VMEM-resident per row-band.

STATUS: correct (interpret-mode parity 6e-5 vs the jnp ops; bf16 on-chip
parity ~0.15 on O(5) values) but PARKED — measured 3.2 ms vs XLA's 1.9 ms
at 512²×48 bf16 on v5e. The solver is VPU-elementwise-bound, and the
boundary-mask selects this kernel needs (clamp/zero semantics against the
global row index) cost more than XLA's fused pad+slice shifts save. Kept
as a tested starting point; the winning fusion strategy so far is the
MXU-heavy gated block (ops/pallas/gated_block.py, 1.8×). Next ideas:
drop the masks on interior bands (specialised first/last-band kernels),
bf16 VPU arithmetic, and fusing the full 3-iteration CG to amortise the
edge-weight reads.

Implementation notes:
  * Bands are pre-gathered OUTSIDE the kernel with clamped row indices
    (x: halo 4, weights: halo 2), so image-border replicate semantics come
    for free on x; derived arrays use select-based clamped/zero H-shifts
    against the *global* row index (band base = program_id·tile_h).
  * W-direction shifts are pltpu.roll + boundary fix (aligned, no
    relayout); H-direction shifts are row concats (untiled dim, free).
  * Per-graph edge weights (lanes e·G+g) are expanded to per-channel via
    pltpu.repeat on the lane dim (np.repeat order matches channel g·F+f);
    Mosaic rejects rank-3 matmuls with tiny K, so the one-hot-dot variant
    didn't lower.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# edge order must match ops.windows.EDGE_DELTAS_CROSS4
_DELTAS = ((-1, 0), (0, -1), (0, 1), (1, 0))


def _wshift(v, dw, w, interpret, zero):
    """out[:, j] = v[:, j+dw]; boundary: zero-fill or edge-clamp."""
    if dw == 0:
        return v
    if interpret:
        r = jnp.roll(v, -dw, axis=1)
    else:
        r = pltpu.roll(v, (-dw) % w, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    edge = w - 1 if dw == 1 else 0
    return jnp.where(col == edge, jnp.zeros_like(v) if zero else v, r)


def _hshift(v, dh, grow, img_h, zero):
    """out[l] = v[l+dh]; boundary (image border via global row index):
    zero-fill or clamp-to-self. Band-local edges use the adjacent row
    (those outputs are halo rows that never reach the core)."""
    if dh == 1:
        r = jnp.concatenate([v[1:], v[-1:]], axis=0)
    else:
        r = jnp.concatenate([v[:1], v[:-1]], axis=0)
    src = grow + dh
    valid = (src >= 0) & (src <= img_h - 1)
    return jnp.where(valid, r, jnp.zeros_like(v) if zero else v)


def _shift(v, dh, dw, grow, img_h, w, interpret, zero=False):
    out = v
    if dh:
        out = _hshift(out, dh, grow, img_h, zero)
    if dw:
        out = _wshift(out, dw, w, interpret, zero)
    return out


def _stats(x, p, grow, img_h, w, interpret):
    """p: (4, C) rows = p01, p02a, p02b, p03; clamped shifts."""
    r = _shift(x, 0, 1, grow, img_h, w, interpret)
    d = _shift(x, 1, 0, grow, img_h, w, interpret)
    u = _shift(x, -1, 0, grow, img_h, w, interpret)
    l = _shift(x, 0, -1, grow, img_h, w, interpret)
    return (p[0] * x + p[1] * (r - x) + p[2] * (d - x)
            + p[3] * (4.0 * x - u - d - l - r))


def _stats_t(x, p, grow, img_h, w, interpret):
    """Transposed stencil: flipped taps, zero-fill boundaries."""
    r0 = _shift(x, 0, 1, grow, img_h, w, interpret, zero=True)
    d0 = _shift(x, 1, 0, grow, img_h, w, interpret, zero=True)
    u0 = _shift(x, -1, 0, grow, img_h, w, interpret, zero=True)
    l0 = _shift(x, 0, -1, grow, img_h, w, interpret, zero=True)
    return (p[0] * x + p[1] * (l0 - x) + p[2] * (u0 - x)
            + p[3] * (4.0 * x - u0 - d0 - l0 - r0))


def _kernel(xb_ref, wglr_ref, wgtv_ref, pglr_ref, pgtv_ref,
            ptglr_ref, ptgtv_ref, mu_ref, ro_ref, out_ref,
            *, tile_h, img_h, w, c, n_graphs, interpret):
    i = pl.program_id(1)
    base = i * tile_h
    # compute in f32: pltpu.roll only supports 32-bit data, and the CG
    # accumulation benefits from the precision
    x = xb_ref[0, 0].astype(jnp.float32)   # (tile_h+8, W, C), rows global base-4..
    wglr = wglr_ref[0, 0].astype(jnp.float32)  # (tile_h+4, W, E*G), rows base-2..
    wgtv = wgtv_ref[0, 0].astype(jnp.float32)
    g = n_graphs
    th8 = tile_h + 8

    rows8 = jax.lax.broadcasted_iota(jnp.int32, (th8, 1, 1), 0) + (base - 4)

    f = c // g

    def wmap(wband, e):
        """per-channel weight map for edge e on the x row grid (halo'd
        rows beyond the w band reuse its edge rows — never reach the core).
        Lane expansion graph→channel via pltpu.repeat (np.repeat order,
        matching channel index g·F+f)."""
        wg = wband[:, :, e * g:(e + 1) * g]
        if interpret:
            we = jnp.repeat(wg, f, axis=2)
        else:
            we = pltpu.repeat(wg, f, axis=2)
        return jnp.concatenate([we[:1], we[:1], we, we[-1:], we[-1:]], axis=0)

    # ---- GLR: statsT(μ ⊙ (s − Σ_e w_e · shift_e(s))) -------------------
    s = _stats(x, pglr_ref[:].astype(jnp.float32), rows8, img_h, w, interpret)
    wx = None
    for e, (dh, dw) in enumerate(_DELTAS):
        term = wmap(wglr, e) * _shift(s, dh, dw, rows8, img_h, w, interpret)
        wx = term if wx is None else wx + term
    glr_core = mu_ref[:].astype(jnp.float32) * (s - wx)

    # ---- GTV: statsT(ρ ⊙ Σ_e (w_e·ε_e − shift₋ₑ⁰(w_e·ε_e))) ------------
    s2 = _stats(x, pgtv_ref[:].astype(jnp.float32), rows8, img_h, w, interpret)
    acc = None
    for e, (dh, dw) in enumerate(_DELTAS):
        wm = wmap(wgtv, e)
        eps = wm * (s2 - _shift(s2, dh, dw, rows8, img_h, w, interpret))
        we = wm * eps
        term = we - _shift(we, -dh, -dw, rows8, img_h, w, interpret, zero=True)
        acc = term if acc is None else acc + term
    gtv_core = ro_ref[:].astype(jnp.float32) * acc

    out = (x
           + _stats_t(glr_core, ptglr_ref[:].astype(jnp.float32), rows8, img_h, w, interpret)
           + _stats_t(gtv_core, ptgtv_ref[:].astype(jnp.float32), rows8, img_h, w, interpret))
    out_ref[0] = out[4:tile_h + 4].astype(out_ref.dtype)


def _band_indices(h, tile_h, halo):
    n_bands = h // tile_h
    idx = (np.arange(n_bands)[:, None] * tile_h
           + np.arange(-halo, tile_h + halo)[None, :])
    return np.clip(idx, 0, h - 1)


@functools.partial(
    jax.jit,
    static_argnames=("n_graphs", "tile_h", "interpret"),
)
def fused_system_matvec(
    x: jnp.ndarray,
    w_glr: jnp.ndarray,
    w_gtv: jnp.ndarray,
    stats_glr: jnp.ndarray,
    stats_gtv: jnp.ndarray,
    mu_c: jnp.ndarray,
    ro_c: jnp.ndarray,
    *,
    n_graphs: int,
    tile_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B,H,W,C); w_glr/w_gtv: (B,H,W,G,E) softmax edge weights;
    stats_*: (4, C) rows p01,p02a,p02b,p03 (pass ones/zeros appropriately
    when the variant disables orders); mu_c/ro_c: (C,) per-channel scales
    (exp already applied). Returns x + μ⊙GLR(x) + ρ⊙GTV(x)."""
    bsz, h, w, c = x.shape
    g = n_graphs
    e = w_glr.shape[-1]
    assert e == 4 and h % tile_h == 0 and w % 8 == 0

    # bands (clamped row gather)
    xb = jnp.take(x, jnp.asarray(_band_indices(h, tile_h, 4).reshape(-1)), axis=1)
    xb = xb.reshape(bsz, h // tile_h, tile_h + 8, w, c)

    def band_w(warr):
        flat = warr.transpose(0, 1, 2, 4, 3).reshape(bsz, h, w, e * g)
        wb = jnp.take(flat, jnp.asarray(_band_indices(h, tile_h, 2).reshape(-1)), axis=1)
        return wb.reshape(bsz, h // tile_h, tile_h + 4, w, e * g)

    wglr_b = band_w(w_glr).astype(x.dtype)
    wgtv_b = band_w(w_gtv).astype(x.dtype)

    kernel = functools.partial(
        _kernel, tile_h=tile_h, img_h=h, w=w, c=c, n_graphs=g,
        interpret=interpret,
    )
    n_bands = h // tile_h
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), x.dtype),
        grid=(bsz, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, tile_h + 8, w, c), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_h + 4, w, e * g), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_h + 4, w, e * g), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stats glr
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stats gtv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # statsT glr (same values)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # statsT gtv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mu
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ro
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            # the f32 intermediates overflow the default 16M scoped-vmem
            # budget; v5e has 128M physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xb, wglr_b, wgtv_b,
      stats_glr.astype(x.dtype), stats_gtv.astype(x.dtype),
      stats_glr.astype(x.dtype), stats_gtv.astype(x.dtype),
      mu_c.astype(x.dtype), ro_c.astype(x.dtype))
