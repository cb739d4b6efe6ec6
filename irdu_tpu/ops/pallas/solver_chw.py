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
# per-plane op bodies, shared by all kernels below. Each takes one
# assembled (rows, W) f32 plane plus shift closures (sh: graph-op reads,
# shs: stats pad mode, shz: zero pad) and returns a (rows, W) plane.
# ---------------------------------------------------------------------------


def _gtv_quad_plane(x, wgtv, pgtv, g, f, deltas, sh, shs, shz):
    """statsᵀ(Σ_e [w·ε − shift₋ₑ⁰(w·ε)]), ε = w·(s₂ − shift_e s₂) — the
    CᵀC quadratic GTV term (ops.graph.gtv_apply)."""
    s2 = _stats2(x, pgtv, g, f, shs)
    acc = None
    for (dh, dw), we in zip(deltas, wgtv):
        eps = we * (s2 - sh(s2, dh, dw))
        wei = we * eps
        term = wei - shz(wei, -dh, -dw)
        acc = term if acc is None else acc + term
    return _stats2_t(acc, pgtv, g, f, shz)


def _glr_plane(x, wglr, pglr, g, f, deltas, sh, shs, shz):
    """statsᵀ(s − Σ_e w_e ⊙ shift_e(s)), s = stats(x) (ops.graph.glr_apply)."""
    s = _stats2(x, pglr, g, f, shs)
    wx = None
    for (dh, dw), we in zip(deltas, wglr):
        term = we * sh(s, dh, dw)
        wx = term if wx is None else wx + term
    return _stats2_t(s - wx, pglr, g, f, shz)


def _rethresh_plane(x, wgtv, pgtv, g, f, gamma, deltas, sh, shs, shz):
    """Cᵀ(2·S_γ(Cx) − Cx): the ADMM re-threshold body
    (reference v1x0.py:757-781)."""
    s2 = _stats2(x, pgtv, g, f, shs)
    acc = None
    for (dh, dw), we in zip(deltas, wgtv):
        eps = we * (s2 - sh(s2, dh, dw))
        thr = (jnp.where(eps < -gamma, eps + gamma, 0.0)
               + jnp.where(eps > gamma, eps - gamma, 0.0))
        t = 2.0 * thr - eps
        wei = we * t
        term = wei - shz(wei, -dh, -dw)
        acc = term if acc is None else acc + term
    return _stats2_t(acc, pgtv, g, f, shz)


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
        out = ro * _gtv_quad_plane(x, wgtv, pgtv, gidx, f, deltas,
                                   sh, shs, shz)
        if with_glr:
            out = out + mu * _glr_plane(x, wglr, pglr, gidx, f, deltas,
                                        sh, shs, shz)
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
        out = (ro * _rethresh_plane(x, wgtv, pgtv, gidx, f, gamma, deltas,
                                    sh, shs, shz))[hx:hx + tile_h]
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
# fused whole-step kernel: one pallas_call per unroll step
# ---------------------------------------------------------------------------
#
# The three kernels above leave the unroll as ~12 pallas_calls per
# filtering block with XLA glue (box resample, CG axpys) between them —
# each boundary is an HBM round trip of the full latent plus the ~0.13 ms
# per-call fixed cost on this rig. The fused kernel computes ONE whole
# unroll step per call:
#
#   mode "rhs":      out = x + ρ₀·Q₀(x) [+ Up(ρ₁·Q₁(Dn x))]
#                    (ADMM init RHS, reference v1x0.py:738-749;
#                     pixel family v6.py:930-940)
#   mode "cg":       r   = rhs − A·x,  A = I + μ⊙GLR + ρ⊙Q  per scale
#                    upd = r [+ β⊙prev]
#                    out = x + α⊙upd   (CG step, v1x0.py:751-753/784-790)
#   mode "rethresh": out = [y +] ρ₀·R₀(x) [+ Up(ρ₁·R₁(Dn x))]
#                    (ADMM re-threshold + RHS rebuild, v1x0.py:757-781)
#
# where Q = CᵀC (gtv quad), R = Cᵀ(2S_γ(C·) − C·). The flagship's second
# scale (box 2×2 down/up, v1x0.py:642-682) is folded IN-KERNEL: box
# down/up run as tiny 0/1-matrix matmuls on the otherwise-idle MXU
# (rows and lanes separately), so the half-res contribution costs no
# extra pallas_call and no HBM round trip. The x band is gathered with a
# doubled halo (2·hx full-res rows = hx half-res rows) so both scales'
# stencils read from one operand.
# ---------------------------------------------------------------------------


def _updown_mats(rows_x, w, w2, tile):
    """0/1 resampling matrices (f32, built from iota): Rd/Cd box-down the
    assembled band (rows pair-summed / lanes pair-summed), Ru/Cu duplicate
    rows/lanes back up. Matmuls with these run on the MXU."""
    def iota2(m, n):
        return (jax.lax.broadcasted_iota(jnp.int32, (m, n), 0),
                jax.lax.broadcasted_iota(jnp.int32, (m, n), 1))

    a, b = iota2(rows_x // 2, rows_x)
    rd = (b // 2 == a).astype(jnp.float32)
    a, b = iota2(w, w2)
    cd = (a // 2 == b).astype(jnp.float32)
    a, b = iota2(tile, tile // 2)
    ru = (a // 2 == b).astype(jnp.float32)
    a, b = iota2(w2, w)
    cu = (b // 2 == a).astype(jnp.float32)
    return rd, cd, ru, cu


def _dot(a, b):
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32)


def _fused_kernel(x_ref, xh_ref, aux_ref, prev_ref,
                  wglr0_ref, wglr0h_ref, wgtv0_ref, wgtv0h_ref,
                  wglr1_ref, wglr1h_ref, wgtv1_ref, wgtv1h_ref,
                  pglr0_ref, pgtv0_ref, pglr1_ref, pgtv1_ref,
                  scal_ref, *out_refs,
                  n_f, tile, true_h, true_w, deltas, stats_mode, mode,
                  two_scale, with_glr, no_stats, use_x_rhs, has_prev,
                  emit_update, include_y, interpret):
    gidx = pl.program_id(1)
    i = pl.program_id(2)
    hx, hw = _halo_x(deltas), _halo_w(deltas)
    hb = 2 * hx if two_scale else hx       # x-band halo (full-res rows)
    n_e = len(deltas)
    w = x_ref.shape[-1]

    grows0 = (jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * hx, 1), 0)
              + i * tile - hx)
    sh0 = functools.partial(_shift, grows=grows0, true_h=true_h,
                            true_w=true_w, interpret=interpret)
    shs0 = functools.partial(sh0, mode=stats_mode)
    shz0 = functools.partial(sh0, zero=True)

    # per-graph scalars (SMEM): [μ₀, ρ₀, μ₁, ρ₁, α, β, γ₀, γ₁]
    mu0, ro0 = scal_ref[gidx, 0], scal_ref[gidx, 1]
    mu1, ro1 = scal_ref[gidx, 2], scal_ref[gidx, 3]
    alpha, beta = scal_ref[gidx, 4], scal_ref[gidx, 5]
    gam0, gam1 = scal_ref[gidx, 6], scal_ref[gidx, 7]

    pglr0 = None if no_stats else pglr0_ref
    pgtv0 = None if no_stats else pgtv0_ref
    pglr1 = None if no_stats else pglr1_ref
    pgtv1 = None if no_stats else pgtv1_ref

    def asm(body_ref, halo_ref, halo, grow_to):
        return [_assemble(body_ref[0, 0, e].astype(jnp.float32),
                          halo_ref[0, 0, e, 0].astype(jnp.float32),
                          halo, grow_to=grow_to) for e in range(n_e)]

    need_glr = mode == "cg" and with_glr
    wgtv0 = asm(wgtv0_ref, wgtv0h_ref, hw, hx)
    wglr0 = asm(wglr0_ref, wglr0h_ref, hw, hx) if need_glr else None

    if two_scale:
        tile2 = tile // 2
        rows_x = tile + 2 * hb
        rows_h = rows_x // 2                       # tile2 + 2·hx
        w2 = w // 2
        th2, tw2 = true_h // 2, true_w // 2
        grows1 = (jax.lax.broadcasted_iota(jnp.int32, (rows_h, 1), 0)
                  + i * tile2 - hx)
        sh1 = functools.partial(_shift, grows=grows1, true_h=th2,
                                true_w=tw2, interpret=interpret)
        shs1 = functools.partial(sh1, mode=stats_mode)
        shz1 = functools.partial(sh1, zero=True)
        rd, cd, ru, cu = _updown_mats(rows_x, w, w2, tile)
        wgtv1 = asm(wgtv1_ref, wgtv1h_ref, hw, hx)
        wglr1 = asm(wglr1_ref, wglr1h_ref, hw, hx) if need_glr else None

    for f in range(n_f):
        xb = _assemble(x_ref[0, 0, f], xh_ref[0, 0, f, 0],
                       hb).astype(jnp.float32)     # (tile + 2·hb, W)
        xf = xb[hb - hx: hb + hx + tile]           # full-res view + hx halo
        xbody = xf[hx: hx + tile]

        # -- second scale (in-kernel box-down → op → box-up) --------------
        if two_scale:
            xd = 0.25 * _dot(_dot(rd, xb), cd)     # (rows_h, W/2)
            if mode == "rethresh":
                t1 = ro1 * _rethresh_plane(xd, wgtv1, pgtv1, gidx, f, gam1,
                                           deltas, sh1, shs1, shz1)
            else:
                t1 = ro1 * _gtv_quad_plane(xd, wgtv1, pgtv1, gidx, f,
                                           deltas, sh1, shs1, shz1)
                if need_glr:
                    t1 = t1 + mu1 * _glr_plane(xd, wglr1, pglr1, gidx, f,
                                               deltas, sh1, shs1, shz1)
            # box_up2x2 duplicates AND scales by 0.25 (models.layers)
            up = 0.25 * _dot(ru, _dot(t1[hx: hx + tile2], cu))  # (tile, W)

        # -- first scale ---------------------------------------------------
        if mode == "rethresh":
            t0 = ro0 * _rethresh_plane(xf, wgtv0, pgtv0, gidx, f, gam0,
                                       deltas, sh0, shs0, shz0)
        else:
            t0 = ro0 * _gtv_quad_plane(xf, wgtv0, pgtv0, gidx, f,
                                       deltas, sh0, shs0, shz0)
            if need_glr:
                t0 = t0 + mu0 * _glr_plane(xf, wglr0, pglr0, gidx, f,
                                           deltas, sh0, shs0, shz0)
        t0 = t0[hx: hx + tile]
        if two_scale:
            t0 = t0 + up

        if mode == "rhs":
            out = xbody + t0
        elif mode == "rethresh":
            out = t0
            if include_y:
                out = out + aux_ref[0, 0, f].astype(jnp.float32)
        else:  # cg
            ax = xbody + t0
            rhs = xbody if use_x_rhs else aux_ref[0, 0, f].astype(jnp.float32)
            upd = rhs - ax
            if has_prev:
                upd = upd + beta * prev_ref[0, 0, f].astype(jnp.float32)
            out = xbody + alpha * upd
            if emit_update:
                out_refs[1][0, 0, f] = upd.astype(out_refs[1].dtype)
        out_refs[0][0, 0, f] = out.astype(out_refs[0].dtype)


@functools.partial(jax.jit, static_argnames=(
    "mode", "n_graphs", "true_h", "true_w", "deltas", "stats_mode",
    "with_glr", "use_x_rhs", "emit_update", "interpret"))
def gg_fused_step_chw(x, aux, prev, w_gtv0, w_glr0, w_gtv1, w_glr1,
                      pgtv0, pglr0, pgtv1, pglr1, scal, *, mode,
                      n_graphs, true_h, true_w, deltas=CROSS4,
                      stats_mode="edge", with_glr=True, use_x_rhs=False,
                      emit_update=False, interpret=False):
    """One fused unroll step (see the mode table above).

    x: (B, C, H, W). aux: rhs ("cg", unless use_x_rhs) or y ("rethresh",
    optional) or None. prev: previous CG update direction (β-momentum) or
    None. w_*0: (B, G, E, H, W) full-res edge weights; w_*1:
    (B, G, E, H/2, W/2) half-res weights or None (single-scale). p*:
    (G, 4, F) stats tables or None (no_orders). scal: (G, 8) f32 table
    [μ₀, ρ₀, μ₁, ρ₁, α, β, γ₀, γ₁] (unused entries zero).

    Returns out, or (out, update) when emit_update ("cg" only).
    """
    b, c, h, w = x.shape
    g = n_graphs
    f = c // g
    n_e = len(deltas)
    two_scale = w_gtv1 is not None
    hx, hw = _halo_x(deltas), _halo_w(deltas)
    hb = 2 * hx if two_scale else hx
    if two_scale:
        th = 32 if h % 32 == 0 else 16
    else:
        th = _pick_tile_h(h)
    nb = h // th
    has_prev = prev is not None
    include_y = mode == "rethresh" and aux is not None
    need_aux = include_y or (mode == "cg" and not use_x_rhs)

    xv = x.reshape(b, g, f, h, w)
    xh = _gather_halos(xv, th, hb)

    def body_or_dummy(a, k):
        if a is None:
            return jnp.zeros((b, g, k, 8, w), x.dtype), _dummy_spec(k, 8, w)
        return a.reshape(b, g, k, h, w), _body_spec(k, th, w)

    aux_in, aux_spec = body_or_dummy(aux if need_aux else None, f)
    prev_in, prev_spec = body_or_dummy(prev, f)

    def w_or_dummy(a, hh, ww, tt):
        """Full-res or half-res weight operand + its gathered halo."""
        if a is None:
            return ((jnp.zeros((b, g, n_e, 8, w), x.dtype),
                     _dummy_spec(n_e, 8, w)),
                    (jnp.zeros((b, g, n_e, 1, 2, w), x.dtype),
                     pl.BlockSpec((1, 1, n_e, 1, 2, w),
                                  lambda b_, g_, i_: (b_, g_, 0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)))
        return ((a, _body_spec(n_e, tt, ww)),
                (_gather_halos(a, tt, hw), _halo_spec(n_e, 2 * hw, ww)))

    need_glr = mode == "cg" and with_glr
    (wgtv0_in, wgtv0_spec), (wgtv0h_in, wgtv0h_spec) = \
        w_or_dummy(w_gtv0, h, w, th)
    (wglr0_in, wglr0_spec), (wglr0h_in, wglr0h_spec) = \
        w_or_dummy(w_glr0 if need_glr else None, h, w, th)
    (wgtv1_in, wgtv1_spec), (wgtv1h_in, wgtv1h_spec) = \
        w_or_dummy(w_gtv1 if two_scale else None, h // 2, w // 2, th // 2)
    (wglr1_in, wglr1_spec), (wglr1h_in, wglr1h_spec) = \
        w_or_dummy(w_glr1 if (two_scale and need_glr) else None,
                   h // 2, w // 2, th // 2)

    no_stats = pgtv0 is None
    dummy_p = jnp.zeros((g, 4, f), jnp.float32)
    pgtv0_in = dummy_p if pgtv0 is None else pgtv0
    pglr0_in = dummy_p if pglr0 is None else pglr0
    pgtv1_in = dummy_p if pgtv1 is None else pgtv1
    pglr1_in = dummy_p if pglr1 is None else pglr1

    kernel = functools.partial(
        _fused_kernel, n_f=f, tile=th, true_h=true_h, true_w=true_w,
        deltas=deltas, stats_mode=stats_mode, mode=mode,
        two_scale=two_scale, with_glr=with_glr, no_stats=no_stats,
        use_x_rhs=use_x_rhs, has_prev=has_prev, emit_update=emit_update,
        include_y=include_y, interpret=interpret)
    out_shape = jax.ShapeDtypeStruct((b, g, f, h, w), x.dtype)
    out_shapes = (out_shape, out_shape) if emit_update else (out_shape,)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(b, g, nb),
        in_specs=[
            _body_spec(f, th, w),
            _halo_spec(f, 2 * hb, w),
            aux_spec,
            prev_spec,
            wglr0_spec, wglr0h_spec,
            wgtv0_spec, wgtv0h_spec,
            wglr1_spec, wglr1h_spec,
            wgtv1_spec, wgtv1h_spec,
            _smem_spec(pglr0_in.shape),
            _smem_spec(pgtv0_in.shape),
            _smem_spec(pglr1_in.shape),
            _smem_spec(pgtv1_in.shape),
            _smem_spec(scal.shape),
        ],
        out_specs=tuple(_body_spec(f, th, w) for _ in out_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(xv, xh, aux_in, prev_in,
      wglr0_in, wglr0h_in, wgtv0_in, wgtv0h_in,
      wglr1_in, wglr1h_in, wgtv1_in, wgtv1h_in,
      pglr0_in, pgtv0_in, pglr1_in, pgtv1_in, scal)
    if emit_update:
        return (outs[0].reshape(b, c, h, w), outs[1].reshape(b, c, h, w))
    return outs[0].reshape(b, c, h, w)


def fused_scal(n_graphs, mu0=None, ro0=None, mu1=None, ro1=None,
               alpha=None, beta=None, gamma0=None, gamma1=None):
    """Build the (G, 8) scalar table for gg_fused_step_chw."""
    cols = []
    for v in (mu0, ro0, mu1, ro1, alpha, beta, gamma0, gamma1):
        if v is None:
            cols.append(jnp.zeros((n_graphs,), jnp.float32))
        else:
            cols.append(jnp.asarray(v, jnp.float32).reshape(-1))
    return jnp.stack(cols, axis=1)


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
