"""Whole-unroll CHW Pallas kernel: the ENTIRE flagship ADMM/CG solve in
one pallas_call.

Key structural fact (reference deep_multiscale_GGLR_GGTV_v1x0.py:707-811):
once the edge weights are extracted, the unrolled two-scale GGTV+GGLR
solve is *embarrassingly parallel over (batch, graph, node-feature
plane)* — stats_conv is a per-channel polynomial stencil, the edge
weights broadcast over the F node features of their graph, and the CG
α/β are learned per-graph scalars (no global dot products). So instead
of one fused kernel per unroll step (ops/pallas/solver_chw.py
``gg_fused_step_chw``: 6 pallas_calls per filtering block, row-band
grids, halo gathers), this kernel runs ONE grid program per (b, g, f)
that holds a single full (H, W) plane in VMEM and executes every step —
RHS build, CG 1, ADMM re-threshold, CG 2-3 — back to back.

What that buys on a v5e (PERF.md round-3 numbers):

  * per-call fixed cost (~0.13 ms) paid once per filtering block, not 6×;
  * zero inter-step HBM traffic: the iterate, the RHS, and the CG
    momentum live in VMEM for the whole solve;
  * zero halo machinery: the full H extent is present, so H-boundary
    shifts are exact ``concatenate`` with the proper boundary row
    (replicate / zero / reflect) — no row masks, no clamp-gathers, no
    halo-region recompute;
  * weights are DMA'd once per (b, g) (f is the innermost grid axis, so
    the weight blocks are unchanged between consecutive programs and
    Mosaic skips the re-fetch).

The second scale (box 2×2 down/up, v1x0.py:642-682) is folded in-kernel
as 0/1-matrix matmuls on the otherwise idle MXU, exactly like the
band kernel. Half-res operands whose width is below the 128-lane DMA
minimum (flagship scale2: W/2 = 64) arrive lane-padded; all W shifts
mask against the true width, and every path from the pad columns back
into the true region goes through a masked shift or through the up-matmul
(whose pad rows are zero), so the pad never leaks.

The jnp path (solvers/gtv_glr.py ``__call__``) stays authoritative;
this kernel is inference-only and parity-tested against it in interpret
mode (tests/test_solver_unroll.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from irdu_tpu.ops.pallas.solver_chw import (
    CROSS4,
    _VMEM,
    _dot,
    _glr_plane,
    _gtv_quad_plane,
    _rethresh_plane,
    _smem_spec,
    _wshift1,
)

# Planes above 512^2 need more scoped VMEM than the 100 MB the band
# kernels request (768x1024 measured at 102.69 MB); 112 MB is proven safe
# on v5e (the th=64 block stacks run at it — ops/pallas/block_stack.py).
# Requested only for large planes so the <=512^2 HLO (and its persistent
# compile-cache entries) stays byte-identical.
_VMEM_LARGE = 112 * 1024 * 1024

__all__ = ["gg_unroll_chw", "unroll_scal",
           "gg_pixel_unroll_chw", "pixel_unroll_scal"]


def _hshift_full1(v, dh, mode):
    """Full-plane row shift: out[r] = v[r + dh], dh ∈ {−1, +1}. The full H
    extent is present, so the boundary row is exact — replicate (edge),
    zero, or mirror (reflect) — with no masks."""
    if mode == "zero":
        fix = jnp.zeros_like(v[:1])
    if dh == 1:
        if mode == "edge":
            fix = v[-1:]
        elif mode == "reflect":
            fix = v[-2:-1]
        return jnp.concatenate([v[1:], fix], axis=0)
    if mode == "edge":
        fix = v[:1]
    elif mode == "reflect":
        fix = v[1:2]
    return jnp.concatenate([fix, v[:-1]], axis=0)


def _shift_full(v, dh, dw, *, true_w, interpret, zero=False, mode=None):
    """Composed full-plane shift (same composition rules as solver_chw:
    edge/zero compose per unit step; reflect only ever used at distance
    1). W shifts are lane rolls with a boundary-column fix against the
    true (unpadded) width."""
    if mode is None:
        mode = "zero" if zero else "edge"
    for _ in range(abs(dh)):
        v = _hshift_full1(v, 1 if dh > 0 else -1, mode)
    for _ in range(abs(dw)):
        v = _wshift1(v, 1 if dw > 0 else -1, true_w, interpret, mode)
    return v


class _StatsScalars:
    """Pre-loaded per-(g, f) stats taps; quacks like the (G, 4, F) SMEM ref
    the shared plane bodies index as p[g, k, f] (one SMEM load per tap
    instead of one per use)."""

    def __init__(self, vals):
        self._vals = vals

    def __getitem__(self, idx):
        return self._vals[idx[1]]


def _load_stats(ref, g, f):
    if ref is None:
        return None
    return _StatsScalars(tuple(ref[g, k, f] for k in range(4)))


def _updown_full(h, w, w1p):
    """Full-image 0/1 resampling matrices (built from iota, f32):
    rd (H/2, H) / cd (W, W1P) box-down rows / lanes; ru (H, H/2) /
    cu (W1P, W) duplicate back up. W1P may exceed W/2 (lane padding) —
    the extra cd columns / cu rows are automatically zero, so padded
    half-res columns are produced as zero and dropped on the way up."""
    def iota2(m, n):
        return (jax.lax.broadcasted_iota(jnp.int32, (m, n), 0),
                jax.lax.broadcasted_iota(jnp.int32, (m, n), 1))

    a, b = iota2(h // 2, h)
    rd = (b // 2 == a).astype(jnp.float32)
    a, b = iota2(w, w1p)
    cd = (a // 2 == b).astype(jnp.float32)
    a, b = iota2(h, h // 2)
    ru = (a // 2 == b).astype(jnp.float32)
    a, b = iota2(w1p, w)
    cu = (b // 2 == a).astype(jnp.float32)
    return rd, cd, ru, cu


def _unroll_kernel(y_ref, wgtv0_ref, wglr0_ref, wgtv1_ref, wglr1_ref,
                   pgtv0_ref, pglr0_ref, pgtv1_ref, pglr1_ref, scal_ref,
                   out_ref, *, n_e, true_w0, true_w1, deltas, stats_mode,
                   eval_cg_iters, no_stats, interpret):
    g = pl.program_id(1)
    f = pl.program_id(2)

    sh0 = functools.partial(_shift_full, true_w=true_w0, interpret=interpret)
    shs0 = functools.partial(sh0, mode=stats_mode)
    shz0 = functools.partial(sh0, zero=True)
    sh1 = functools.partial(_shift_full, true_w=true_w1, interpret=interpret)
    shs1 = functools.partial(sh1, mode=stats_mode)
    shz1 = functools.partial(sh1, zero=True)

    wgtv0 = [wgtv0_ref[0, 0, e].astype(jnp.float32) for e in range(n_e)]
    wglr0 = [wglr0_ref[0, 0, e].astype(jnp.float32) for e in range(n_e)]
    wgtv1 = [wgtv1_ref[0, 0, e].astype(jnp.float32) for e in range(n_e)]
    wglr1 = [wglr1_ref[0, 0, e].astype(jnp.float32) for e in range(n_e)]
    pgtv0 = _load_stats(None if no_stats else pgtv0_ref, g, f)
    pglr0 = _load_stats(None if no_stats else pglr0_ref, g, f)
    pgtv1 = _load_stats(None if no_stats else pgtv1_ref, g, f)
    pglr1 = _load_stats(None if no_stats else pglr1_ref, g, f)

    # per-graph scalars: [μ₀, ρ₀, μ₁, ρ₁, γ₀, γ₁, α₀, α₁, α₂, β₂]
    mu0, ro0 = scal_ref[g, 0], scal_ref[g, 1]
    mu1, ro1 = scal_ref[g, 2], scal_ref[g, 3]
    gam0, gam1 = scal_ref[g, 4], scal_ref[g, 5]
    alpha = [scal_ref[g, 6 + i] for i in range(3)]
    beta2 = scal_ref[g, 9]

    y = y_ref[0, 0, 0].astype(jnp.float32)             # (H, W)
    h, w = y.shape
    w1p = wgtv1_ref.shape[-1]                          # padded half width
    rd, cd, ru, cu = _updown_full(h, w, w1p)

    def down(v):
        return 0.25 * _dot(_dot(rd, v), cd)

    def up(t):
        # box_up2x2 duplicates AND scales by 0.25 (models.layers)
        return 0.25 * _dot(ru, _dot(t, cu))

    def q0(v):
        return _gtv_quad_plane(v, wgtv0, pgtv0, g, f, deltas,
                               sh0, shs0, shz0)

    def q1(v):
        return _gtv_quad_plane(v, wgtv1, pgtv1, g, f, deltas,
                               sh1, shs1, shz1)

    def matvec(x, xd):
        """A·x = x + μ₀GLR₀x + ρ₀Q₀x + Up(μ₁GLR₁ + ρ₁Q₁)Dn x
        (reference apply_lightweight_transformer, v1x0.py:642-682)."""
        t0 = ro0 * q0(x) + mu0 * _glr_plane(x, wglr0, pglr0, g, f, deltas,
                                            sh0, shs0, shz0)
        t1 = ro1 * q1(xd) + mu1 * _glr_plane(xd, wglr1, pglr1, g, f, deltas,
                                             sh1, shs1, shz1)
        return x + t0 + up(t1)

    # ADMM init RHS: y + ρ₀·Cᵀ₀C₀y + ρ₁·Up(Cᵀ₁C₁·Dn y)   (v1x0.py:738-749)
    rhs_a = y + ro0 * q0(y) + up(ro1 * q1(down(y)))

    # CG step 1 (v1x0.py:751-753) — x₀ = RHS itself
    x = rhs_a + alpha[0] * (rhs_a - matvec(rhs_a, down(rhs_a)))

    if eval_cg_iters >= 2:
        # ADMM re-threshold + new RHS (v1x0.py:757-781)
        rhs_b = (y
                 + ro0 * _rethresh_plane(x, wgtv0, pgtv0, g, f, gam0,
                                         deltas, sh0, shs0, shz0)
                 + up(ro1 * _rethresh_plane(down(x), wgtv1, pgtv1, g, f,
                                            gam1, deltas, sh1, shs1, shz1)))
        # CG steps 2-3 with β-momentum (β[1] unused by design,
        # v1x0.py:784-790)
        upd1 = rhs_b - matvec(x, down(x))
        x = x + alpha[1] * upd1
        if eval_cg_iters >= 3:
            upd2 = rhs_b - matvec(x, down(x)) + beta2 * upd1
            x = x + alpha[2] * upd2

    out_ref[0, 0, 0] = x.astype(out_ref.dtype)


def unroll_scal(n_graphs, mu0, ro0, mu1, ro1, gamma0, gamma1, alphas, betas):
    """Build the (G, 10) scalar table: [μ₀, ρ₀, μ₁, ρ₁, γ₀, γ₁, α₀, α₁, α₂,
    β₂]. alphas/betas: (3, G) CG tables (only β[2] is used — the reference
    quirk, v1x0.py:785)."""
    g = n_graphs
    cols = [jnp.asarray(v, jnp.float32).reshape(g)
            for v in (mu0, ro0, mu1, ro1, gamma0, gamma1,
                      alphas[0], alphas[1], alphas[2], betas[2])]
    return jnp.stack(cols, axis=1)


@functools.partial(jax.jit, static_argnames=(
    "n_graphs", "eval_cg_iters", "deltas", "stats_mode", "true_w",
    "interpret"))
def gg_unroll_chw(y, w_gtv0, w_glr0, w_gtv1, w_glr1, pgtv0, pglr0,
                  pgtv1, pglr1, scal, *, n_graphs, eval_cg_iters=3,
                  deltas=CROSS4, stats_mode="edge", true_w=None,
                  interpret=False):
    """The whole two-scale GGTV+GGLR unroll as ONE pallas_call.

    y: (B, C, H, W) solver input (C = G·F). w_*0: (B, G, E, H, W)
    full-res edge weights; w_*1: (B, G, E, H/2, W1P) half-res weights,
    lane-padded to W1P ≥ 128 when W/2 < 128 (the pad columns' values are
    irrelevant — see module docstring). p*: (G, 4, F) stats tables or
    None (no_orders). scal: (G, 10) from ``unroll_scal``.

    true_w: the image width when the FULL-res operands are themselves
    lane-padded (flagship scale3: W=64 → operands padded to 128; every W
    shift masks against true_w, the in-kernel box down/up confines pad
    columns to pad columns by construction, and the output is cropped
    back). None means W is the true width.

    Shape requirements: H % 16 == 0 (half-res DMA sublanes), the padded
    W % 128 == 0, one (H, W) f32 plane + the per-graph weights must fit
    VMEM (H·W ≤ 768·1024 measured safe on v5e at the 112 MB large-plane
    limit — Kodak/Urban100-scale eval planes qualify; the caller falls
    back to the band kernels above that, see solvers.gtv_glr._mega_ok).
    """
    b, c, h, w = y.shape
    g = n_graphs
    f = c // g
    n_e = len(deltas)
    w1p = w_gtv1.shape[-1]
    tw = true_w or w
    yv = y.reshape(b, g, f, h, w)

    no_stats = pgtv0 is None
    dummy_p = jnp.zeros((g, 4, f), jnp.float32)
    ps = [dummy_p if p is None else p for p in (pgtv0, pglr0, pgtv1, pglr1)]

    kernel = functools.partial(
        _unroll_kernel, n_e=n_e, true_w0=tw, true_w1=tw // 2, deltas=deltas,
        stats_mode=stats_mode, eval_cg_iters=eval_cg_iters,
        no_stats=no_stats, interpret=interpret)

    def plane_spec():
        return pl.BlockSpec((1, 1, 1, h, w),
                            lambda bi, gi, fi: (bi, gi, fi, 0, 0),
                            memory_space=pltpu.VMEM)

    def weight_spec(hh, ww):
        # constant over the innermost f axis → fetched once per (b, g)
        return pl.BlockSpec((1, 1, n_e, hh, ww),
                            lambda bi, gi, fi: (bi, gi, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, g, f, h, w), y.dtype),
        grid=(b, g, f),
        in_specs=[
            plane_spec(),
            weight_spec(h, w), weight_spec(h, w),
            weight_spec(h // 2, w1p), weight_spec(h // 2, w1p),
            _smem_spec(ps[0].shape), _smem_spec(ps[1].shape),
            _smem_spec(ps[2].shape), _smem_spec(ps[3].shape),
            _smem_spec(scal.shape),
        ],
        out_specs=plane_spec(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM if h * w <= 512 * 512 else _VMEM_LARGE),
        interpret=interpret,
    )(yv, w_gtv0, w_glr0, w_gtv1, w_glr1, *ps, scal)
    if tw != w:
        out = out[..., :tw]
    return out.reshape(b, c, h, tw)


# ---------------------------------------------------------------------------
# pixel-family (v1-v8) whole-unroll kernel: single scale, 2 ADMM rounds ×
# 2 CG steps with accumulating bias (reference model_GLR_GTV_deep_v6.py:
# 892-1016). Same per-(b, graph, plane) parallelism as the flagship kernel;
# additionally the G-fold replication of the input image is NEVER
# materialized — each (b, g, f) program blocks its plane straight out of
# the un-tiled (B, 1, F, H, W) input. This is the shape class where the
# per-step band kernels measurably LOST to XLA (PERF.md: 24 hypotheses ×
# F=3 tiny planes, 12-edge diamond halo recompute, 6 pallas_calls); here
# every one of those costs is gone.
# ---------------------------------------------------------------------------


def _pixel_unroll_kernel(y_ref, wgtv_ref, wglr_ref, pgtv_ref, pglr_ref,
                         scal_ref, out_ref, *, n_e, true_w, deltas,
                         stats_mode, no_stats, interpret):
    g = pl.program_id(1)
    f = pl.program_id(2)

    sh = functools.partial(_shift_full, true_w=true_w, interpret=interpret)
    shs = functools.partial(sh, mode=stats_mode)
    shz = functools.partial(sh, zero=True)

    wgtv = [wgtv_ref[0, 0, e].astype(jnp.float32) for e in range(n_e)]
    wglr = [wglr_ref[0, 0, e].astype(jnp.float32) for e in range(n_e)]
    pgtv = _load_stats(None if no_stats else pgtv_ref, g, f)
    pglr = _load_stats(None if no_stats else pglr_ref, g, f)

    # per-graph scalars: [μ, ρ, γ, α₀..α₃, β₁, β₃]
    mu, ro, gam = scal_ref[g, 0], scal_ref[g, 1], scal_ref[g, 2]
    alpha = [scal_ref[g, 3 + i] for i in range(4)]
    beta1, beta3 = scal_ref[g, 7], scal_ref[g, 8]

    y = y_ref[0, 0, 0].astype(jnp.float32)

    def q(v):
        return _gtv_quad_plane(v, wgtv, pgtv, g, f, deltas, sh, shs, shz)

    def matvec(x):
        """A·x = x + μ·GLR x + ρ·CᵀC x (v6.py:892-911)."""
        return (x + ro * q(x)
                + mu * _glr_plane(x, wglr, pglr, g, f, deltas, sh, shs, shz))

    # round 1: ε = C·ỹ, bias 0 → rhs = ỹ + ρ·CᵀC ỹ (v6.py:978-981)
    rhs = y + ro * q(y)
    x = rhs
    upd = rhs - matvec(x)
    x = x + alpha[0] * upd
    upd = rhs - matvec(x) + beta1 * upd     # β[0] unused (v6 quirk)
    x = x + alpha[1] * upd

    # ADMM re-threshold; bias was 0 so ε − bias = 2·S_γ(Cx) − Cx
    # (v6.py:983-989)
    rhs = y + ro * _rethresh_plane(x, wgtv, pgtv, g, f, gam, deltas,
                                   sh, shs, shz)

    # round 2: CG restart from the new RHS (v6.py:995)
    x = rhs
    upd = rhs - matvec(x)
    x = x + alpha[2] * upd
    upd = rhs - matvec(x) + beta3 * upd     # β[2] unused
    x = x + alpha[3] * upd

    out_ref[0, 0, 0] = x.astype(out_ref.dtype)


def pixel_unroll_scal(n_graphs, mu, ro, gamma, alphas, betas):
    """(G, 9) scalar table: [μ, ρ, γ, α₀..α₃, β₁, β₃]. alphas/betas:
    (4, G); only β[1] and β[3] enter the updates (v6 quirk)."""
    g = n_graphs
    cols = [jnp.asarray(v, jnp.float32).reshape(g)
            for v in (mu, ro, gamma, alphas[0], alphas[1], alphas[2],
                      alphas[3], betas[1], betas[3])]
    return jnp.stack(cols, axis=1)


@functools.partial(jax.jit, static_argnames=(
    "n_graphs", "deltas", "stats_mode", "interpret"))
def gg_pixel_unroll_chw(y, w_gtv, w_glr, pgtv, pglr, scal, *, n_graphs,
                        deltas, stats_mode="reflect", interpret=False):
    """The whole pixel-family unroll as ONE pallas_call.

    y: (B, F, H, W) — the UN-tiled DC-corrected image (ỹ); the G-fold
    hypothesis replication happens virtually via the block index map.
    w_gtv/w_glr: (B, G, E, H, W). pgtv/pglr: (G, 4, F) stats tables or
    None. scal: (G, 9) from ``pixel_unroll_scal``.
    Returns (B, G·F, H, W). Needs H % 8 == 0, W % 128 == 0, H·W ≤ 512².
    """
    b, f, h, w = y.shape
    g = n_graphs
    n_e = len(deltas)
    yv = y.reshape(b, 1, f, h, w)

    no_stats = pgtv is None
    dummy_p = jnp.zeros((g, 4, f), jnp.float32)
    ps = [dummy_p if p is None else p for p in (pgtv, pglr)]

    kernel = functools.partial(
        _pixel_unroll_kernel, n_e=n_e, true_w=w, deltas=deltas,
        stats_mode=stats_mode, no_stats=no_stats, interpret=interpret)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, g, f, h, w), y.dtype),
        grid=(b, g, f),
        in_specs=[
            pl.BlockSpec((1, 1, 1, h, w),
                         lambda bi, gi, fi: (bi, 0, fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_e, h, w),
                         lambda bi, gi, fi: (bi, gi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_e, h, w),
                         lambda bi, gi, fi: (bi, gi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _smem_spec(ps[0].shape), _smem_spec(ps[1].shape),
            _smem_spec(scal.shape),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, h, w),
                               lambda bi, gi, fi: (bi, gi, fi, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM if h * w <= 512 * 512 else _VMEM_LARGE),
        interpret=interpret,
    )(yv, w_gtv, w_glr, *ps, scal)
    return out.reshape(b, g * f, h, w)
