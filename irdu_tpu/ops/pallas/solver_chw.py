"""Fused CHW (space-on-lanes) kernels for the GGTV+GGLR unrolled solver.

Why CHW: the flagship's latent codes are (B, H, W, C) with C = 48..384.
With C on the 128-wide lane dimension, scale0 (C=48) reaches only ~125 GB/s
HBM and 37 % of VPU lanes on this v5e; transposing to (B, C, H, W) puts W
(512/256) on lanes → measured 940 GB/s streaming and full-lane VPU
(scripts/microbench_pallas_bw.py, PERF.md round-2 notes). Edge weights live
compactly as (B, G, E, H, W) planes — per-graph, not repeated over node
features — and broadcast over the F channel planes inside the kernels for
free, so weight traffic drops 6-12× vs the flat NHWC form.

Three kernels cover the solver's hot surface (reference
/root/reference/exploration/GGTV_GGLR_v1.0/deep_multiscale_GGLR_GGTV_v1x0.py):

  * ``edge_weights_chw``  — normalize + metric + 4 neighbour dots + softmax
    (reference ``extract_edge_weights``, v1x0.py:146-175).
  * ``gg_matvec_chw``     — out = [x +] μ⊙GLR(x) + ρ⊙GTV(x), one scale of
    ``apply_lightweight_transformer`` (v1x0.py:642-682). With μ=0 it also
    builds the ADMM init RHS (y + ρ·CᵀC y, v1x0.py:738-749).
  * ``gtv_rethresh_chw``  — [y +] ρ⊙Cᵀ(2·S_γ(Cx) − Cx), the ADMM
    re-threshold + RHS rebuild (v1x0.py:757-781).

Kernel structure (shaped by Mosaic's lowering rules):

  * grid (B, G, n_bands); row bands pre-gathered with clamped row indices
    so H-edge-replicate of the *input* comes free; derived arrays get
    masked shifts against the global row index (shift2d replicates the
    derived array's own boundary row — recomputing it on clamped x rows
    differs).
  * all vector math is 2D (rows, W) per channel plane — Mosaic cannot
    broadcast a vector element across both sublanes and lanes, so the
    per-channel stencil coefficients and per-graph scales live in SMEM
    and multiply as true scalar splats, with a Python loop over the F
    planes of the block.
  * W shifts are lane rolls + boundary-column selects against the *true*
    width (operands may be lane-padded to a multiple of 128); f32 compute
    (pltpu.roll is 32-bit-only), bf16 in/out.

The jnp flat-channel path (ops.graph) stays authoritative; these kernels
are inference-only and tested against it in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default window; edge order must match ops.windows.WINDOWS["cross4"]:
# shift2d reads x[i+dh, j+dw].
CROSS4 = ((-1, 0), (0, -1), (0, 1), (1, 0))

_VMEM = 100 * 1024 * 1024  # v5e has 128 MB physical VMEM


def _radius(deltas):
    return max(max(abs(dh), abs(dw)) for dh, dw in deltas)


def _halo_x(deltas):
    """x halo: op_c shift (r) + op_cT shift (r) + stats + statsᵀ (1 each)."""
    return 2 * _radius(deltas) + 2


def _halo_w(deltas):
    """weight halo: rows where op_c/op_cT evaluate: r + statsᵀ(1)."""
    return _radius(deltas) + 1


# ---------------------------------------------------------------------------
# in-kernel shift algebra — arrays are 2D (rows, W): rows sublane, W lane.
# Multi-step shifts (|d| = 2 for the diamond-12 window) compose from unit
# steps: composed edge-clamp == clamp and composed zero == zero. Reflect
# does NOT compose at the outermost row — it is only ever needed at
# distance 1 (the 3×3 stats stencil is the sole reflect consumer; the
# graph ops' neighbour reads are always replicate/zero).
# ---------------------------------------------------------------------------


def _wshift1(v, dw, true_w, interpret, mode):
    """out[:, j] = v[:, j+dw], dw ∈ {−1, +1}; boundary at the true image
    width: mode ∈ 'edge' (replicate) | 'zero' | 'reflect'."""
    w = v.shape[-1]
    if interpret:
        r = jnp.roll(v, -dw, axis=1)
    else:
        r = pltpu.roll(v, (-dw) % w, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    if dw == 1:
        bad = col == true_w - 1
    else:
        bad = col == 0
    if true_w != w:
        bad = bad | (col + dw >= true_w)
    if mode == "zero":
        fix = jnp.zeros_like(v)
    elif mode == "edge":
        fix = v
    else:  # reflect: the mirrored read is the opposite-direction shift
        if interpret:
            fix = jnp.roll(v, dw, axis=1)
        else:
            fix = pltpu.roll(v, dw % w, axis=1)
    return jnp.where(bad, fix, r)


def _hshift1(v, dh, grows, true_h, mode):
    """out[r, :] = v[r+dh, :], dh ∈ {−1, +1}. Out-of-image reads (src row
    beyond the true extent, via the global row index grows) are masked —
    note edge mode uses the unshifted value (shift2d replicates the
    *derived array's* own boundary row, which differs from recomputing it
    on clamp-gathered x rows)."""
    if dh == 1:
        r = jnp.concatenate([v[1:], v[-1:]], axis=0)
        o = jnp.concatenate([v[:1], v[:-1]], axis=0)
    else:
        r = jnp.concatenate([v[:1], v[:-1]], axis=0)
        o = jnp.concatenate([v[1:], v[-1:]], axis=0)
    src = grows + dh
    bad = (src < 0) | (src > true_h - 1)
    if mode == "zero":
        fix = jnp.zeros_like(v)
    elif mode == "edge":
        fix = v
    else:  # reflect
        fix = o
    return jnp.where(bad, fix, r)


def _shift(v, dh, dw, grows, true_h, true_w, interpret, zero=False,
           mode=None):
    if mode is None:
        mode = "zero" if zero else "edge"
    g = grows
    for _ in range(abs(dh)):
        v = _hshift1(v, 1 if dh > 0 else -1, g, true_h, mode)
        g = g + (1 if dh > 0 else -1)
    for _ in range(abs(dw)):
        v = _wshift1(v, 1 if dw > 0 else -1, true_w, interpret, mode)
    return v


def _stats2(v, p, g, f, sh):
    """Polynomial 3×3 stencil on one (rows, W) plane, replicate boundary
    (ops.graph.stats_conv). p: SMEM ref (G, 4, F) or None."""
    if p is None:
        return v
    r = sh(v, 0, 1)
    d = sh(v, 1, 0)
    u = sh(v, -1, 0)
    l = sh(v, 0, -1)
    return (p[g, 0, f] * v + p[g, 1, f] * (r - v) + p[g, 2, f] * (d - v)
            + p[g, 3, f] * (4.0 * v - u - d - l - r))


def _stats2_t(v, p, g, f, shz):
    """Adjoint stencil: flipped taps, zero boundary
    (ops.graph.stats_conv_transpose)."""
    if p is None:
        return v
    r0 = shz(v, 0, 1)
    d0 = shz(v, 1, 0)
    u0 = shz(v, -1, 0)
    l0 = shz(v, 0, -1)
    return (p[g, 0, f] * v + p[g, 1, f] * (l0 - v) + p[g, 2, f] * (u0 - v)
            + p[g, 3, f] * (4.0 * v - u0 - d0 - l0 - r0))


def _assemble(body, halos, halo, grow_to=0):
    """Stitch a (tile, W) body and its (2·halo, W) halo rows back into the
    (tile+2·halo, W) band; optionally grow further by replicating edge rows
    (to align arrays with different halo depths — the grown rows are
    discarded halo)."""
    d = max(grow_to - halo, 0)
    parts = ([halos[:1]] * d + [halos[:halo], body, halos[halo:]]
             + [halos[-1:]] * d)
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------


def _matvec_kernel(x_ref, xh_ref, wglr_ref, wglrh_ref, wgtv_ref, wgtvh_ref,
                   pglr_ref, pgtv_ref, scal_ref,
                   out_ref, *, n_f, tile_h, true_h, true_w, deltas,
                   stats_mode, no_glr_stats, no_gtv_stats, add_identity,
                   with_glr, interpret):
    gidx = pl.program_id(1)
    i = pl.program_id(2)
    hx, hw = _halo_x(deltas), _halo_w(deltas)
    n_e = len(deltas)
    rows = tile_h + 2 * hx
    grows = (jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
             + i * tile_h - hx)
    sh = functools.partial(_shift, grows=grows, true_h=true_h, true_w=true_w,
                           interpret=interpret)
    shs = functools.partial(sh, mode=stats_mode)   # stats_conv pad mode
    shz = functools.partial(sh, zero=True)
    pglr = None if no_glr_stats else pglr_ref
    pgtv = None if no_gtv_stats else pgtv_ref
    wgtv = [_assemble(wgtv_ref[0, 0, e].astype(jnp.float32),
                      wgtvh_ref[0, 0, e, 0].astype(jnp.float32),
                      hw, grow_to=hx) for e in range(n_e)]
    if with_glr:
        wglr = [_assemble(wglr_ref[0, 0, e].astype(jnp.float32),
                          wglrh_ref[0, 0, e, 0].astype(jnp.float32),
                          hw, grow_to=hx) for e in range(n_e)]
        mu = scal_ref[gidx, 0]
    ro = scal_ref[gidx, 1]

    for f in range(n_f):
        x = _assemble(x_ref[0, 0, f], xh_ref[0, 0, f, 0],
                      hx).astype(jnp.float32)              # (rows, W)

        # GTV: statsᵀ(Σ_e [w_e·ε_e − shift₋ₑ⁰(w_e·ε_e)]),
        #      ε_e = w_e·(s₂ − shift_e s₂)
        s2 = _stats2(x, pgtv, gidx, f, shs)
        acc = None
        for e, (dh, dw) in enumerate(deltas):
            we = wgtv[e]
            eps = we * (s2 - sh(s2, dh, dw))
            wei = we * eps
            term = wei - shz(wei, -dh, -dw)
            acc = term if acc is None else acc + term
        out = ro * _stats2_t(acc, pgtv, gidx, f, shz)

        if with_glr:
            # GLR: statsᵀ(s − Σ_e w_e ⊙ shift_e(s)), s = stats(x)
            s = _stats2(x, pglr, gidx, f, shs)
            wx = None
            for e, (dh, dw) in enumerate(deltas):
                term = wglr[e] * sh(s, dh, dw)
                wx = term if wx is None else wx + term
            out = out + mu * _stats2_t(s - wx, pglr, gidx, f, shz)

        if add_identity:
            out = out + x
        out_ref[0, 0, f] = out[hx:hx + tile_h].astype(out_ref.dtype)


def _rethresh_kernel(x_ref, xh_ref, y_ref, wgtv_ref, wgtvh_ref, pgtv_ref,
                     scal_ref, out_ref,
                     *, n_f, tile_h, true_h, true_w, deltas, stats_mode,
                     no_gtv_stats, include_y, interpret):
    gidx = pl.program_id(1)
    i = pl.program_id(2)
    hx, hw = _halo_x(deltas), _halo_w(deltas)
    rows = tile_h + 2 * hx
    grows = (jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
             + i * tile_h - hx)
    sh = functools.partial(_shift, grows=grows, true_h=true_h, true_w=true_w,
                           interpret=interpret)
    shs = functools.partial(sh, mode=stats_mode)
    shz = functools.partial(sh, zero=True)
    pgtv = None if no_gtv_stats else pgtv_ref
    wgtv = [_assemble(wgtv_ref[0, 0, e].astype(jnp.float32),
                      wgtvh_ref[0, 0, e, 0].astype(jnp.float32),
                      hw, grow_to=hx) for e in range(len(deltas))]
    gamma = scal_ref[gidx, 0]
    ro = scal_ref[gidx, 1]

    for f in range(n_f):
        x = _assemble(x_ref[0, 0, f], xh_ref[0, 0, f, 0],
                      hx).astype(jnp.float32)
        s2 = _stats2(x, pgtv, gidx, f, shs)
        acc = None
        for e, (dh, dw) in enumerate(deltas):
            we = wgtv[e]
            eps = we * (s2 - sh(s2, dh, dw))
            # ε − bias = 2·S_γ(Cx) − Cx  (reference v1x0.py:757-781)
            thr = (jnp.where(eps < -gamma, eps + gamma, 0.0)
                   + jnp.where(eps > gamma, eps - gamma, 0.0))
            t = 2.0 * thr - eps
            wei = we * t
            term = wei - shz(wei, -dh, -dw)
            acc = term if acc is None else acc + term
        out = (ro * _stats2_t(acc, pgtv, gidx, f, shz))[hx:hx + tile_h]
        if include_y:
            out = out + y_ref[0, 0, f].astype(jnp.float32)
        out_ref[0, 0, f] = out.astype(out_ref.dtype)


def _edgew_kernel(f_ref, fh_ref, m_ref, out_ref, *, n_f, tile_h, true_h,
                  true_w, deltas, interpret):
    gidx = pl.program_id(1)
    i = pl.program_id(2)
    r = _radius(deltas)
    rows = tile_h + 2 * r
    grows = (jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
             + i * tile_h - r)
    sh = functools.partial(_shift, grows=grows, true_h=true_h, true_w=true_w,
                           interpret=interpret)

    xs = [_assemble(f_ref[0, 0, f], fh_ref[0, 0, f, 0], r).astype(jnp.float32)
          for f in range(n_f)]
    ss = None
    for x in xs:
        ss = x * x if ss is None else ss + x * x
    inv = 1.0 / jnp.maximum(jnp.sqrt(ss), 1e-12)
    ts = [x * inv * m_ref[gidx, f] for f, x in enumerate(xs)]

    sims = []
    for dh, dw in deltas:
        s = None
        for f in range(n_f):
            term = ts[f] * sh(ts[f], dh, dw)
            s = term if s is None else s + term
        sims.append(s)
    mx = sims[0]
    for s in sims[1:]:
        mx = jnp.maximum(mx, s)
    exps = [jnp.exp(s - mx) for s in sims]
    den = exps[0]
    for e in exps[1:]:
        den = den + e
    for e in range(len(deltas)):
        out_ref[0, 0, e] = (exps[e] / den).astype(
            out_ref.dtype)[r:r + tile_h]


# ---------------------------------------------------------------------------
# CHW-layout jnp glue (XLA handles these fine; kept here so the solver's
# CHW path is self-contained)
# ---------------------------------------------------------------------------


def box_down_chw(x):
    """models.layers.box_down2x2 on (B, C, H, W)."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    return (x[:, :, :, 0, :, 0] + x[:, :, :, 0, :, 1]
            + x[:, :, :, 1, :, 0] + x[:, :, :, 1, :, 1]) * 0.25


def box_up_chw(x):
    """models.layers.box_up2x2 on (B, C, H, W)."""
    b, c, h, w = x.shape
    y = x[:, :, :, None, :, None] * 0.25
    return jnp.broadcast_to(y, (b, c, h, 2, w, 2)).reshape(b, c, 2 * h, 2 * w)


# ---------------------------------------------------------------------------
# band gathering + pallas_call wrappers
# ---------------------------------------------------------------------------


def _halo_rows_idx(h, tile_h, halo):
    """Per band: the halo rows [band·th−halo, band·th) ++ [end, end+halo),
    clamped to the image."""
    nb = h // tile_h
    idx = np.concatenate([
        np.arange(nb)[:, None] * tile_h + np.arange(-halo, 0)[None, :],
        np.arange(nb)[:, None] * tile_h + tile_h + np.arange(0, halo)[None, :],
    ], axis=1)
    return jnp.asarray(np.clip(idx, 0, h - 1).reshape(-1))


def _gather_halos(x, tile_h, halo):
    """(B, G, K, H, W) → (B, G, K, nb, 2·halo, W): only the halo rows are
    copied (clamped); the band bodies block straight from x with no copy."""
    b, g, k, h, w = x.shape
    nb = h // tile_h
    xh = jnp.take(x, _halo_rows_idx(h, tile_h, halo), axis=3)
    return xh.reshape(b, g, k, nb, 2 * halo, w)


def _pick_tile_h(h):
    for th in (64, 32, 16, 8):
        if h % th == 0:
            return th
    raise ValueError(f"H={h} not a multiple of 8")


def _body_spec(k, th, w):
    """Non-overlapping band body straight out of a (B, G, K, H, W) array —
    no host-side copy."""
    return pl.BlockSpec((1, 1, k, th, w),
                        lambda b, g, i: (b, g, 0, i, 0),
                        memory_space=pltpu.VMEM)


def _halo_spec(k, rows, w):
    """Per-band halo rows from a (B, G, K, nb, 2·halo, W) gather."""
    return pl.BlockSpec((1, 1, k, 1, rows, w),
                        lambda b, g, i: (b, g, 0, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _dummy_spec(k, rows, w):
    """For unused dummy operands: always block 0 (never out of bounds)."""
    return pl.BlockSpec((1, 1, k, rows, w),
                        lambda b, g, i: (b, g, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _smem_spec(shape):
    """Per-graph scalar table, whole array in SMEM (Mosaic requires SMEM
    blocks to cover the full array); kernels index it by program_id(1)."""
    del shape
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _stats_pg(stats, n_graphs, n_node_fts):
    """ops.graph stats dict (each entry (C,) or scalar) → (G, 4, F) f32;
    None (no_orders) passes through."""
    if stats is None:
        return None
    g, f = n_graphs, n_node_fts
    rows = []
    for k in ("p01", "p02a", "p02b", "p03"):
        v = jnp.asarray(stats[k], jnp.float32).reshape(-1)
        if v.size == 1:
            v = jnp.broadcast_to(v, (g * f,))
        rows.append(v.reshape(g, f))
    return jnp.stack(rows, axis=1)  # (G, 4, F)


@functools.partial(jax.jit, static_argnames=(
    "n_graphs", "true_h", "true_w", "deltas", "stats_mode", "add_identity",
    "with_glr", "interpret"))
def gg_matvec_chw(x, w_glr, w_gtv, pglr, pgtv, mu, ro, *, n_graphs,
                  true_h, true_w, deltas=CROSS4, stats_mode="edge",
                  add_identity=True, with_glr=True, interpret=False):
    """x: (B, C, H, W); w_glr/w_gtv: (B, G, E, H, W); pglr/pgtv: (G, 4, F)
    or None (no_orders); mu/ro: (G,) positive scales (exp already applied
    where the parameterisation is log). deltas: static (dh, dw) window
    (cross4 / diamond12 / ring8); stats_mode: stats_conv pad mode ("edge"
    flagship / "reflect" v5–v8 pixel family).
    Returns [x +] μ⊙GLR(x) + ρ⊙GTV(x) as (B, C, H, W). with_glr=False
    skips the GLR branch entirely (the μ=0 ADMM-init RHS)."""
    b, c, h, w = x.shape
    g = n_graphs
    f = c // g
    n_e = len(deltas)
    hx, hw = _halo_x(deltas), _halo_w(deltas)
    th = _pick_tile_h(h)
    nb = h // th
    xv = x.reshape(b, g, f, h, w)
    xh = _gather_halos(xv, th, hx)
    wgtv_h = _gather_halos(w_gtv, th, hw)
    if with_glr:
        wglr_in, wglr_h = w_glr, _gather_halos(w_glr, th, hw)
    else:
        wglr_in = jnp.zeros((b, g, n_e, 8, w), x.dtype)
        wglr_h = jnp.zeros((b, g, n_e, 1, 2, w), x.dtype)

    dummy = jnp.zeros((g, 4, f), jnp.float32)
    pglr_in = dummy if pglr is None else pglr
    pgtv_in = dummy if pgtv is None else pgtv
    scal = jnp.stack([jnp.asarray(mu, jnp.float32).reshape(-1),
                      jnp.asarray(ro, jnp.float32).reshape(-1)], axis=1)

    kernel = functools.partial(
        _matvec_kernel, n_f=f, tile_h=th, true_h=true_h, true_w=true_w,
        deltas=deltas, stats_mode=stats_mode,
        no_glr_stats=pglr is None, no_gtv_stats=pgtv is None,
        add_identity=add_identity, with_glr=with_glr, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, g, f, h, w), x.dtype),
        grid=(b, g, nb),
        in_specs=[
            _body_spec(f, th, w),
            _halo_spec(f, 2 * hx, w),
            _body_spec(n_e, th, w) if with_glr else _dummy_spec(n_e, 8, w),
            _halo_spec(n_e, 2 * hw, w) if with_glr
            else pl.BlockSpec((1, 1, n_e, 1, 2, w),
                              lambda b, g, i: (b, g, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM),
            _body_spec(n_e, th, w),
            _halo_spec(n_e, 2 * hw, w),
            _smem_spec(pglr_in.shape),
            _smem_spec(pgtv_in.shape),
            _smem_spec(scal.shape),
        ],
        out_specs=_body_spec(f, th, w),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(xv, xh, wglr_in, wglr_h, w_gtv, wgtv_h, pglr_in, pgtv_in, scal)
    return out.reshape(b, c, h, w)


@functools.partial(jax.jit, static_argnames=(
    "n_graphs", "true_h", "true_w", "deltas", "stats_mode", "interpret"))
def gtv_rethresh_chw(x, y, w_gtv, pgtv, gamma, ro, *, n_graphs,
                     true_h, true_w, deltas=CROSS4, stats_mode="edge",
                     interpret=False):
    """[y +] ρ⊙Cᵀ(2·S_γ(Cx) − Cx). x/y: (B, C, H, W) (y may be None);
    w_gtv: (B, G, E, H, W); pgtv: (G, 4, F) or None; gamma/ro: (G,)."""
    b, c, h, w = x.shape
    g = n_graphs
    f = c // g
    hx, hw = _halo_x(deltas), _halo_w(deltas)
    th = _pick_tile_h(h)
    nb = h // th
    xv = x.reshape(b, g, f, h, w)
    xh = _gather_halos(xv, th, hx)
    wgtv_h = _gather_halos(w_gtv, th, hw)
    include_y = y is not None
    if include_y:
        yv = y.reshape(b, g, f, h, w)
    else:
        yv = jnp.zeros((b, g, 1, 8, w), x.dtype)

    dummy = jnp.zeros((g, 4, f), jnp.float32)
    scal = jnp.stack([jnp.asarray(gamma, jnp.float32).reshape(-1),
                      jnp.asarray(ro, jnp.float32).reshape(-1)], axis=1)
    kernel = functools.partial(
        _rethresh_kernel, n_f=f, tile_h=th, true_h=true_h, true_w=true_w,
        deltas=deltas, stats_mode=stats_mode,
        no_gtv_stats=pgtv is None, include_y=include_y, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, g, f, h, w), x.dtype),
        grid=(b, g, nb),
        in_specs=[
            _body_spec(f, th, w),
            _halo_spec(f, 2 * hx, w),
            _body_spec(f, th, w) if include_y else _dummy_spec(1, 8, w),
            _body_spec(len(deltas), th, w),
            _halo_spec(len(deltas), 2 * hw, w),
            _smem_spec((pgtv if pgtv is not None else dummy).shape),
            _smem_spec(scal.shape),
        ],
        out_specs=_body_spec(f, th, w),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(xv, xh, yv, w_gtv, wgtv_h, pgtv if pgtv is not None else dummy, scal)
    return out.reshape(b, c, h, w)


@functools.partial(jax.jit, static_argnames=(
    "n_graphs", "true_h", "true_w", "deltas", "interpret"))
def edge_weights_chw(feats, multi_m, *, n_graphs, true_h, true_w,
                     deltas=CROSS4, interpret=False):
    """feats: (B, C, H, W) → softmax edge weights (B, G, E, H, W) for the
    static (dh, dw) window. multi_m: (G, F)."""
    b, c, h, w = feats.shape
    g = n_graphs
    f = c // g
    r = _radius(deltas)
    th = _pick_tile_h(h)
    nb = h // th
    fv = feats.reshape(b, g, f, h, w)
    fh = _gather_halos(fv, th, r)

    kernel = functools.partial(_edgew_kernel, n_f=f, tile_h=th, true_h=true_h,
                               true_w=true_w, deltas=deltas,
                               interpret=interpret)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, g, len(deltas), h, w), feats.dtype),
        grid=(b, g, nb),
        in_specs=[
            _body_spec(f, th, w),
            _halo_spec(f, 2 * r, w),
            _smem_spec(jnp.asarray(multi_m, jnp.float32).shape),
        ],
        out_specs=_body_spec(len(deltas), th, w),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(fv, fh, jnp.asarray(multi_m, jnp.float32))
    return out
