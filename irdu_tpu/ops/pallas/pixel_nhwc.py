"""NHWC lane-packed fused unroll kernels for the pixel-domain family.

VERDICT r4 #4: the v6-scale pixel family (G=24 graphs × F=3 node features,
diamond-12 window, 2 ADMM rounds × 2 CG steps — reference
model_GLR_GTV_deep_v6.py:802-1016) runs its jnp path at ~2.1 MP/s, ~9% of
VPU peak: ~40 unfused stencil passes stream (B,H,W,72) planes plus 24
repeated edge-weight planes through HBM. The CHW whole-unroll kernel
(solver_unroll.gg_pixel_unroll_chw) loses for THIS family because its
per-(b, graph) programs see only F=3 tiny planes (fixed-cost dominated —
PERF.md round-2 pixel section).

This module keeps the hypotheses TOGETHER on the lane axis instead:

  * signals are (B, H, W, C=G·F) in PLANAR channel order c = f·G + g
    (F-major) — so a per-edge, per-graph weight vector (G,) broadcasts to
    channels as a static lane-tile repeat [w_G | w_G | w_G], a concat of
    three 24-lane slices, instead of the stride-F lane shuffle the
    repo-wide (G,F) interleave would need;
  * per-edge weights ride ONE packed array per op, (B, H, W, E·G = 288)
    bf16 — never repeated over F in HBM (the jnp flat path materialises
    ~1.8 GB of F-repeated weights per 512² frame; this path moves 1/3 of
    that, once per fused segment instead of once per stencil pass);
  * each kernel fuses a whole unroll SEGMENT (rhs-build / CG step /
    re-threshold): 6 pallas_calls per forward instead of ~40 XLA passes.
    Grid = (B, H/tile_h) full-width row bands; halo rows are separately
    blocked inputs (the proven gated_block/solver_chw pattern — manual
    DMA halos measured 60× slower); boundary semantics (replicate
    neighbour reads, REFLECT stats pad — v6:456 — zero scatter) are
    enforced in-kernel against the true image extent exactly as in
    solver_chw's band kernels.

Segment radii (diamond-12, r=2): x halo = 2r+2 = 6 (stats 1 + op shift r
+ scatter r + statsᵀ 1), weight halo = r+1 = 3, grown to 6 in-kernel so
every array shares one row frame.

The jnp path stays authoritative; this is an inference fast path gated by
``MixtureGTV(use_nhwc_unroll=True)`` and parity-tested in interpret mode
(tests/test_pixel_nhwc.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RADIUS_X = 6
RADIUS_W = 3
_F32 = jnp.float32


# ---------------------------------------------------------------------------
# in-kernel shift algebra on (rows, W, C) f32 arrays: rows = leading
# (untiled) dim, W = sublanes, C = lanes. Direct translation of
# solver_chw's 2-D (rows, W) helpers; same composition rules (multi-step
# clamp/zero compose from unit steps; reflect only ever at distance 1).
# ---------------------------------------------------------------------------


def _wshift1(v, dw, interpret, mode):
    """out[:, j] = v[:, j+dw], dw ∈ {−1, +1}; bands span the full width so
    the W boundary is always the true image boundary."""
    w = v.shape[1]
    if interpret:
        r = jnp.roll(v, -dw, axis=1)
    else:
        r = pltpu.roll(v, (-dw) % w, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    bad = (col == w - 1) if dw == 1 else (col == 0)
    if mode == "zero":
        fix = jnp.zeros_like(v)
    elif mode == "edge":
        fix = v
    else:  # reflect = the opposite-direction shift
        if interpret:
            fix = jnp.roll(v, dw, axis=1)
        else:
            fix = pltpu.roll(v, dw % w, axis=1)
    return jnp.where(bad, fix, r)


def _hshift1(v, dh, grows, true_h, mode):
    """out[r] = v[r+dh], dh ∈ {−1, +1}; out-of-true-image reads (tracked
    by the global row index `grows`) replaced per pad mode."""
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


def _shift(v, dh, dw, grows, true_h, interpret, mode):
    g = grows
    for _ in range(abs(dh)):
        v = _hshift1(v, 1 if dh > 0 else -1, g, true_h, mode)
        g = g + (1 if dh > 0 else -1)
    for _ in range(abs(dw)):
        v = _wshift1(v, 1 if dw > 0 else -1, interpret, mode)
    return v


def _assemble(body_ref, top_ref, bot_ref, halo, grow_to, dtype=None):
    """(tile, W, C) body + (halo, W, C) halos -> (tile + 2·grow_to, W, C);
    rows beyond `halo` are replicated edge rows (never read — every read
    of an out-of-image or beyond-halo row is masked by _hshift1). The
    f32 cast is applied only where asked — weight bands stay bf16 in
    VMEM and cast per-edge at use."""
    top, body, bot = top_ref[0, 0], body_ref[0], bot_ref[0, 0]
    d = grow_to - halo
    parts = ([top[:1]] * d + [top, body, bot] + [bot[-1:]] * d)
    out = jnp.concatenate(parts, axis=0)
    return out.astype(dtype) if dtype is not None else out


def _stats(v, p_ref, op, sh):
    """Scalar-coefficient polynomial 3×3 stencil (ops.graph.stats_conv;
    the v5–v8 family's REFLECT boundary is baked into `sh`)."""
    r = sh(v, 0, 1)
    d = sh(v, 1, 0)
    u = sh(v, -1, 0)
    l = sh(v, 0, -1)
    return (p_ref[op, 0] * v + p_ref[op, 1] * (r - v)
            + p_ref[op, 2] * (d - v)
            + p_ref[op, 3] * (4.0 * v - u - d - l - r))


def _stats_t(v, p_ref, op, shz):
    """Adjoint stencil: flipped taps, zero boundary
    (ops.graph.stats_conv_transpose)."""
    r0 = shz(v, 0, 1)
    d0 = shz(v, 1, 0)
    u0 = shz(v, -1, 0)
    l0 = shz(v, 0, -1)
    return (p_ref[op, 0] * v + p_ref[op, 1] * (l0 - v)
            + p_ref[op, 2] * (u0 - v)
            + p_ref[op, 3] * (4.0 * v - u0 - d0 - l0 - r0))


def _edge_w(w_ref, e, n_graphs, n_f):
    """Planar broadcast of edge e's per-graph weights: slice (·,·,G) from
    the packed (·,·,E·G) band, lane-tile ×F."""
    w24 = w_ref[..., e * n_graphs:(e + 1) * n_graphs]
    return jnp.concatenate([w24] * n_f, axis=-1).astype(_F32)


def _gtv(x, w_ref, p_ref, deltas, n_graphs, n_f, sh, shs, shz):
    """statsᵀ(Σ_e [w·ε − shift₋ₑ⁰(w·ε)]), ε = w·(s₂ − shift_e s₂)
    (ops.graph.gtv_apply_flat, CᵀC)."""
    s2 = _stats(x, p_ref, 0, shs)
    acc = None
    for e, (dh, dw) in enumerate(deltas):
        we = _edge_w(w_ref, e, n_graphs, n_f)
        eps = we * (s2 - sh(s2, dh, dw))
        wei = we * eps
        term = wei - shz(wei, -dh, -dw)
        acc = term if acc is None else acc + term
    return _stats_t(acc, p_ref, 0, shz)


def _glr(x, w_ref, p_ref, deltas, n_graphs, n_f, sh, shs, shz):
    """statsᵀ(s − Σ_e w_e ⊙ shift_e s), s = stats(x)
    (ops.graph.glr_apply_flat)."""
    s = _stats(x, p_ref, 1, shs)
    wx = None
    for e, (dh, dw) in enumerate(deltas):
        term = _edge_w(w_ref, e, n_graphs, n_f) * sh(s, dh, dw)
        wx = term if wx is None else wx + term
    return _stats_t(s - wx, p_ref, 1, shz)


def _kernel(x_ref, xt_ref, xb_ref, aux_ref, prev_ref,
            wgtv_ref, wgtvt_ref, wgtvb_ref, wglr_ref, wglrt_ref, wglrb_ref,
            p_ref, scal_ref, out_ref, upd_ref=None, *,
            mode, tile_h, true_h, n_graphs, n_f, deltas, interpret):
    """One fused unroll segment on one (tile_h, W) band of all channels.

    mode:
      "rhs"      out = x + ρ⊙GTV(x)                      (init: rhs from ỹ)
      "cg1"      r = −(μ⊙GLR + ρ⊙GTV)(x [= rhs]); upd = r; out = x + α⊙r
      "cg2"      r = aux − x − (μ⊙GLR + ρ⊙GTV)(x); upd' = r + β⊙prev;
                 out = x + α⊙upd'                        (aux = rhs body)
      "rethresh" out = aux + ρ⊙Cᵀ(2·S_γ(Cx) − Cx)       (aux = ỹ body)

    scal rows: 0=μ, 1=ρ, 2=γ, 3=α, 4=β — planar (C,) vectors.
    """
    i = pl.program_id(1)
    row0 = i * tile_h - RADIUS_X
    rows = tile_h + 2 * RADIUS_X
    grows = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) + row0

    sh = functools.partial(_shift, grows=grows, true_h=true_h,
                           interpret=interpret, mode="edge")

    def sh_e(v, dh, dw):
        return sh(v, dh, dw)

    def shs(v, dh, dw):
        return _shift(v, dh, dw, grows=grows, true_h=true_h,
                      interpret=interpret, mode="reflect")

    def shz(v, dh, dw):
        return _shift(v, dh, dw, grows=grows, true_h=true_h,
                      interpret=interpret, mode="zero")

    x = _assemble(x_ref, xt_ref, xb_ref, RADIUS_X, RADIUS_X, dtype=_F32)
    wgtv = _assemble(wgtv_ref, wgtvt_ref, wgtvb_ref, RADIUS_W, RADIUS_X)
    gtv = functools.partial(_gtv, w_ref=wgtv, p_ref=p_ref, deltas=deltas,
                            n_graphs=n_graphs, n_f=n_f, sh=sh_e, shs=shs,
                            shz=shz)
    ro = scal_ref[1].astype(_F32)
    core = slice(RADIUS_X, RADIUS_X + tile_h)

    if mode == "rhs":
        out = x + ro * gtv(x)
        out_ref[0] = out[core].astype(out_ref.dtype)
        return

    if mode == "rethresh":
        gamma = scal_ref[2].astype(_F32)
        s2 = _stats(x, p_ref, 0, shs)
        acc = None
        for e, (dh, dw) in enumerate(deltas):
            we = _edge_w(wgtv, e, n_graphs, n_f)
            eps = we * (s2 - sh_e(s2, dh, dw))
            thr = (jnp.where(eps < -gamma, eps + gamma, 0.0)
                   + jnp.where(eps > gamma, eps - gamma, 0.0))
            wei = we * (2.0 * thr - eps)
            term = wei - shz(wei, -dh, -dw)
            acc = term if acc is None else acc + term
        ct = _stats_t(acc, p_ref, 0, shz)
        y = aux_ref[0].astype(_F32)
        out_ref[0] = (y + (ro * ct)[core]).astype(out_ref.dtype)
        return

    # CG steps: A·x − x = μ⊙GLR(x) + ρ⊙GTV(x)
    wglr = _assemble(wglr_ref, wglrt_ref, wglrb_ref, RADIUS_W, RADIUS_X)
    mu = scal_ref[0].astype(_F32)
    alpha = scal_ref[3].astype(_F32)
    ax_m_x = (mu * _glr(x, wglr, p_ref, deltas, n_graphs, n_f,
                        sh_e, shs, shz)
              + ro * gtv(x))[core]
    xc = x[core]
    if mode == "cg1":
        res = -ax_m_x  # rhs − A·rhs with x == rhs
        upd = res
        upd_ref[0] = upd.astype(upd_ref.dtype)
    else:  # cg2 — the round's last step; its update feeds nothing
        beta = scal_ref[4].astype(_F32)
        res = aux_ref[0].astype(_F32) - xc - ax_m_x
        upd = res + beta * prev_ref[0].astype(_F32)
    out_ref[0] = (xc + alpha * upd).astype(out_ref.dtype)


def _halos(x, tile_h, halo):
    """(B, H, W, C) -> top/bottom halo stacks (B, nb, halo, W, C) with
    edge-clamped out-of-image rows (masked in-kernel per pad mode)."""
    b, h, w, c = x.shape
    nb = h // tile_h
    pad = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)), mode="edge")
    top = jnp.stack([pad[:, i * tile_h:i * tile_h + halo]
                     for i in range(nb)], axis=1)
    bot = jnp.stack([pad[:, (i + 1) * tile_h + halo:
                         (i + 1) * tile_h + 2 * halo]
                     for i in range(nb)], axis=1)
    return top, bot


def _body_spec(tile_h, w, c):
    return pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _halo_spec(halo, w, c):
    return pl.BlockSpec((1, 1, halo, w, c), lambda b, i: (b, i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile_h", "n_graphs", "deltas", "interpret"))
def pixel_segment_nhwc(x, aux, prev, w_gtv, w_glr, w_halos, p, scal, *,
                       mode, tile_h, n_graphs, deltas, interpret=False):
    """One fused segment over the full image.

    x: (B,H,W,C) planar signal (haloed in here); aux/prev: body-only
    side inputs (rhs / ỹ / previous update) or None; w_gtv/w_glr:
    (B,H,W,E·G) packed per-op weights (w_glr=None for rhs/rethresh);
    w_halos: ((gtv_top, gtv_bot), (glr_top, glr_bot)) precomputed once per
    forward; p: (2,4) stats scalars [gtv, glr]; scal: (5, C) planar rows
    μ,ρ,γ,α,β. Returns out or (out, update) for CG modes.
    """
    b, h, w, c = x.shape
    assert h % tile_h == 0, (h, tile_h)
    nb = h // tile_h
    eg = w_gtv.shape[-1]

    xt, xb = _halos(x, tile_h, RADIUS_X)
    zero_b = jnp.zeros((b, 1, w, c), x.dtype)
    aux = aux if aux is not None else zero_b
    prev = prev if prev is not None else zero_b
    aux_spec = (_body_spec(tile_h, w, c) if aux.shape[1] == h
                else pl.BlockSpec((1, 1, w, c), lambda b, i: (b, 0, 0, 0),
                                  memory_space=pltpu.VMEM))
    prev_spec = (_body_spec(tile_h, w, c) if prev.shape[1] == h
                 else pl.BlockSpec((1, 1, w, c), lambda b, i: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM))

    (wgt, wgb), glr_halos = w_halos
    if w_glr is None:
        w_glr = jnp.zeros((b, 1, w, eg), w_gtv.dtype)
        wlt = jnp.zeros((b, nb, RADIUS_W, w, eg), w_gtv.dtype)
        wlb = wlt
        wglr_spec = pl.BlockSpec((1, 1, w, eg), lambda b, i: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        wglrh_spec = pl.BlockSpec((1, 1, RADIUS_W, w, eg),
                                  lambda b, i: (b, i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        wlt, wlb = glr_halos
        wglr_spec = _body_spec(tile_h, w, eg)
        wglrh_spec = _halo_spec(RADIUS_W, w, eg)

    out_shapes = [jax.ShapeDtypeStruct((b, h, w, c), x.dtype)]
    if mode == "cg1":
        out_shapes.append(jax.ShapeDtypeStruct((b, h, w, c), x.dtype))
    out_specs = [_body_spec(tile_h, w, c)] * len(out_shapes)

    kernel = functools.partial(
        _kernel, mode=mode, tile_h=tile_h, true_h=h, n_graphs=n_graphs,
        n_f=c // n_graphs, deltas=deltas, interpret=interpret)

    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(b, nb),
        in_specs=[
            _body_spec(tile_h, w, c),      # x body
            _halo_spec(RADIUS_X, w, c),    # x top halo
            _halo_spec(RADIUS_X, w, c),    # x bottom halo
            aux_spec,
            prev_spec,
            _body_spec(tile_h, w, eg),     # gtv weights body
            _halo_spec(RADIUS_W, w, eg),
            _halo_spec(RADIUS_W, w, eg),
            wglr_spec,
            wglrh_spec,
            wglrh_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),   # stats scalars (2,4)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scal (5, C)
        ],
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, xt, xb, aux, prev, w_gtv, wgt, wgb, w_glr, wlt, wlb, p, scal)
    return res if len(out_shapes) == 2 else res[0]


def pixel_unroll_nhwc(y72, w_gtv, w_glr, p, scal, *, n_graphs, deltas,
                      tile_h=16, interpret=False):
    """The full fixed 2-ADMM-round unroll (reference v6.py:936-1008 with
    zero incoming bias — see solvers/pixel_gtv.py) as 6 fused segments.

    y72: (B,H,W,C) planar ỹ replicated over graphs; w_gtv/w_glr:
    (B,H,W,E·G) packed weights; p: (2,4); scal: dict with planar (C,)
    vectors mu, ro, gamma and (4, C) alpha, beta. Returns (B,H,W,C).
    """
    whalos = ((_halos(w_gtv, tile_h, RADIUS_W)),
              (_halos(w_glr, tile_h, RADIUS_W)))
    c = y72.shape[-1]
    zeros = jnp.zeros((c,), _F32)

    def scal_rows(alpha=None, beta=None):
        return jnp.stack([
            scal["mu"], scal["ro"], scal["gamma"],
            zeros if alpha is None else alpha,
            zeros if beta is None else beta,
        ]).astype(_F32)

    seg = functools.partial(
        pixel_segment_nhwc, w_gtv=w_gtv, w_halos=whalos, p=p,
        tile_h=tile_h, n_graphs=n_graphs, deltas=deltas, interpret=interpret)

    a, bta = scal["alpha"], scal["beta"]
    # round 1: rhs = ỹ + ρ·CᵀC ỹ  (ε = Cỹ, bias 0)
    rhs = seg(y72, None, None, w_glr=None, scal=scal_rows(), mode="rhs")
    out, upd = seg(rhs, None, None, w_glr=w_glr,
                   scal=scal_rows(alpha=a[0]), mode="cg1")
    out = seg(out, rhs, upd, w_glr=w_glr,
              scal=scal_rows(alpha=a[1], beta=bta[1]), mode="cg2")
    # ADMM re-threshold: rhs' = ỹ + ρ·Cᵀ(2·S_γ(Cx) − Cx)
    rhs = seg(out, y72, None, w_glr=None, scal=scal_rows(), mode="rethresh")
    # round 2: CG restart from the new RHS (v6:995)
    out, upd = seg(rhs, None, None, w_glr=w_glr,
                   scal=scal_rows(alpha=a[2]), mode="cg1")
    out = seg(out, rhs, upd, w_glr=w_glr,
              scal=scal_rows(alpha=a[3], beta=bta[3]), mode="cg2")
    return out
