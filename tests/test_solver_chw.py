"""Interpret-mode parity of the CHW solver kernels (ops/pallas/solver_chw)
against the authoritative flat-channel jnp ops (ops/graph)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irdu_tpu.ops.graph import (
    extract_edge_weights,
    glr_apply,
    gtv_apply,
    op_c,
    op_c_transpose,
    per_graph_scale,
    soft_threshold,
)
from irdu_tpu.ops.pallas.solver_chw import (
    _stats_pg,
    edge_weights_chw,
    gg_matvec_chw,
    gtv_rethresh_chw,
)
from irdu_tpu.ops.windows import WINDOWS

DELTAS = WINDOWS["cross4"]
G, F = 2, 3
C = G * F
H, W = 24, 32


def _rand_stats(rng):
    return {k: jnp.asarray(rng.randn(C) * 0.3 + v, jnp.float32)
            for k, v in (("p01", 1.0), ("p02a", 0.5), ("p02b", 0.5), ("p03", 0.5))}


def _mk(rng, h=H, w=W):
    x = jnp.asarray(rng.randn(1, h, w, C), jnp.float32)
    feats = jnp.asarray(rng.randn(1, h, w, C), jnp.float32)
    multi_m = jnp.asarray(rng.rand(G, F) * 2 + 0.5, jnp.float32)
    weights, _ = extract_edge_weights(feats, multi_m, DELTAS, G)
    return x, feats, multi_m, weights


def _to_chw(a):  # (B,H,W,C) -> (B,C,H,W)
    return jnp.transpose(a, (0, 3, 1, 2))


def _w_chw(weights):  # (B,H,W,G,E) -> (B,G,E,H,W)
    return jnp.transpose(weights, (0, 3, 4, 1, 2))


def _pad(a, ph, pw, axes=(1, 2)):
    pad = [(0, 0)] * a.ndim
    pad[axes[0]] = (0, ph)
    pad[axes[1]] = (0, pw)
    return jnp.pad(a, pad, mode="edge")


def test_edge_weights_chw_matches():
    rng = np.random.RandomState(0)
    _, feats, multi_m, weights = _mk(rng)
    out = edge_weights_chw(_to_chw(feats), multi_m,
                           n_graphs=G, true_h=H, true_w=W, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_w_chw(weights)),
                               atol=1e-5)


def test_matvec_chw_matches():
    rng = np.random.RandomState(1)
    x, feats, multi_m, w_gtv = _mk(rng)
    w_glr, _ = extract_edge_weights(feats + 0.3, multi_m, DELTAS, G)
    sglr, sgtv = _rand_stats(rng), _rand_stats(rng)
    mu = jnp.asarray(rng.rand(G) + 0.1, jnp.float32)
    ro = jnp.asarray(rng.rand(G) + 0.1, jnp.float32)

    ref = (x
           + per_graph_scale(glr_apply(x, w_glr, DELTAS, G, sglr), mu)
           + per_graph_scale(gtv_apply(x, w_gtv, DELTAS, G, sgtv), ro))
    out = gg_matvec_chw(
        _to_chw(x), _w_chw(w_glr), _w_chw(w_gtv),
        _stats_pg(sglr, G, F), _stats_pg(sgtv, G, F),
        mu, ro,
        n_graphs=G, true_h=H, true_w=W, interpret=True)
    np.testing.assert_allclose(np.asarray(_to_chw(ref)), np.asarray(out),
                               atol=2e-4)


def test_matvec_chw_no_identity_no_stats():
    rng = np.random.RandomState(2)
    x, feats, multi_m, w_gtv = _mk(rng)
    w_glr, _ = extract_edge_weights(feats - 0.1, multi_m, DELTAS, G)
    mu = jnp.asarray(rng.rand(G) + 0.1, jnp.float32)
    ro = jnp.asarray(rng.rand(G) + 0.1, jnp.float32)
    ref = (per_graph_scale(glr_apply(x, w_glr, DELTAS, G, None), mu)
           + per_graph_scale(gtv_apply(x, w_gtv, DELTAS, G, None), ro))
    out = gg_matvec_chw(
        _to_chw(x), _w_chw(w_glr), _w_chw(w_gtv), None, None,
        mu, ro,
        n_graphs=G, true_h=H, true_w=W, add_identity=False, interpret=True)
    np.testing.assert_allclose(np.asarray(_to_chw(ref)), np.asarray(out),
                               atol=2e-4)


def test_matvec_chw_padded_matches_true_extent():
    """Lane-padded W / band-padded H: the kernel must reproduce the
    true-extent result in the valid region."""
    rng = np.random.RandomState(3)
    x, feats, multi_m, w_gtv = _mk(rng)
    w_glr, _ = extract_edge_weights(feats * 1.1, multi_m, DELTAS, G)
    sglr, sgtv = _rand_stats(rng), _rand_stats(rng)
    mu = jnp.asarray(rng.rand(G) + 0.1, jnp.float32)
    ro = jnp.asarray(rng.rand(G) + 0.1, jnp.float32)
    ref = (x
           + per_graph_scale(glr_apply(x, w_glr, DELTAS, G, sglr), mu)
           + per_graph_scale(gtv_apply(x, w_gtv, DELTAS, G, sgtv), ro))

    ph, pw = 8, 16
    xp = _pad(_to_chw(x), ph, pw, axes=(2, 3))
    wglr_p = _pad(_w_chw(w_glr), ph, pw, axes=(3, 4))
    wgtv_p = _pad(_w_chw(w_gtv), ph, pw, axes=(3, 4))
    out = gg_matvec_chw(
        xp, wglr_p, wgtv_p, _stats_pg(sglr, G, F), _stats_pg(sgtv, G, F),
        mu, ro,
        n_graphs=G, true_h=H, true_w=W, interpret=True)
    np.testing.assert_allclose(np.asarray(_to_chw(ref)),
                               np.asarray(out[:, :, :H, :W]), atol=2e-4)


def test_rethresh_chw_matches():
    rng = np.random.RandomState(4)
    x, feats, multi_m, w_gtv = _mk(rng)
    sgtv = _rand_stats(rng)
    gamma = jnp.asarray(rng.rand(G) * 0.5 + 0.05, jnp.float32)
    ro = jnp.asarray(rng.rand(G) + 0.1, jnp.float32)
    y = jnp.asarray(rng.randn(1, H, W, C), jnp.float32)

    gamma_c = jnp.repeat(gamma, F)
    eps = op_c(x, w_gtv, DELTAS, G, sgtv)
    t = tuple(2.0 * soft_threshold(e, gamma_c) - e for e in eps)
    ref = y + per_graph_scale(op_c_transpose(t, w_gtv, DELTAS, G, sgtv), ro)

    out = gtv_rethresh_chw(
        _to_chw(x), _to_chw(y), _w_chw(w_gtv), _stats_pg(sgtv, G, F),
        gamma, ro,
        n_graphs=G, true_h=H, true_w=W, interpret=True)
    np.testing.assert_allclose(np.asarray(_to_chw(ref)), np.asarray(out),
                               atol=2e-4)


def test_full_solver_chw_matches_jnp():
    """MixtureGTVGLR with use_pallas_unroll (interpreted on CPU) must match
    the authoritative jnp path on a qualifying shape."""
    from irdu_tpu.solvers.gtv_glr import MixtureGTVGLR

    rng = np.random.RandomState(6)
    h, w = 16, 256
    x = jnp.asarray(rng.randn(1, h, w, C) * 0.3, jnp.float32)
    ref_m = MixtureGTVGLR(n_graphs=G, n_node_fts=F)
    params = ref_m.init(jax.random.PRNGKey(0), x)
    # randomize the log-params so μ/ρ/γ are not at their tiny inits
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.asarray(np.random.RandomState(7).randn(*a.shape),
                                         a.dtype), params)
    ref = ref_m.apply(params, x)
    out = MixtureGTVGLR(n_graphs=G, n_node_fts=F,
                        use_pallas_unroll=True).apply(params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=5e-4, rtol=1e-3)


def test_rethresh_chw_no_y():
    rng = np.random.RandomState(5)
    x, feats, multi_m, w_gtv = _mk(rng)
    gamma = jnp.asarray(rng.rand(G) * 0.5 + 0.05, jnp.float32)
    ro = jnp.asarray(rng.rand(G) + 0.1, jnp.float32)
    gamma_c = jnp.repeat(gamma, F)
    eps = op_c(x, w_gtv, DELTAS, G, None)
    t = tuple(2.0 * soft_threshold(e, gamma_c) - e for e in eps)
    ref = per_graph_scale(op_c_transpose(t, w_gtv, DELTAS, G, None), ro)
    out = gtv_rethresh_chw(
        _to_chw(x), None, _w_chw(w_gtv), None,
        gamma, ro,
        n_graphs=G, true_h=H, true_w=W, interpret=True)
    np.testing.assert_allclose(np.asarray(_to_chw(ref)), np.asarray(out),
                               atol=2e-4)


def test_matvec_chw_diamond12_reflect():
    """The generalized kernels with the v5–v8 pixel-family semantics:
    12-edge 5×5-diamond window, scalar stats with REFLECT padding."""
    rng = np.random.RandomState(8)
    deltas = WINDOWS["diamond12"]
    x = jnp.asarray(rng.randn(1, H, W, C), jnp.float32)
    feats = jnp.asarray(rng.randn(1, H, W, C), jnp.float32)
    multi_m = jnp.asarray(rng.rand(G, F) * 2 + 0.5, jnp.float32)
    w_gtv, _ = extract_edge_weights(feats, multi_m, deltas, G)
    w_glr, _ = extract_edge_weights(feats + 0.2, multi_m, deltas, G)
    # scalar stats (stats_mode="scalar" in GraphOpParams): shape (1,)
    sglr = {k: jnp.asarray([v + 0.1], jnp.float32)
            for k, v in (("p01", 1.0), ("p02a", 0.5), ("p02b", 0.5), ("p03", 0.5))}
    sgtv = {k: jnp.asarray([v - 0.1], jnp.float32)
            for k, v in (("p01", 1.0), ("p02a", 0.5), ("p02b", 0.5), ("p03", 0.5))}
    mu = jnp.asarray(rng.rand(G) + 0.1, jnp.float32)
    ro = jnp.asarray(rng.rand(G) + 0.1, jnp.float32)

    ref = (x
           + per_graph_scale(glr_apply(x, w_glr, deltas, G, sglr, "reflect"), mu)
           + per_graph_scale(gtv_apply(x, w_gtv, deltas, G, sgtv, "reflect"), ro))
    out = gg_matvec_chw(
        _to_chw(x), _w_chw(w_glr), _w_chw(w_gtv),
        _stats_pg(sglr, G, F), _stats_pg(sgtv, G, F), mu, ro,
        n_graphs=G, true_h=H, true_w=W, deltas=deltas, stats_mode="reflect",
        interpret=True)
    np.testing.assert_allclose(np.asarray(_to_chw(ref)), np.asarray(out),
                               atol=5e-4)


def test_edge_weights_chw_diamond12():
    rng = np.random.RandomState(9)
    deltas = WINDOWS["diamond12"]
    feats = jnp.asarray(rng.randn(1, H, W, C), jnp.float32)
    multi_m = jnp.asarray(rng.rand(G, F) * 2 + 0.5, jnp.float32)
    weights, _ = extract_edge_weights(feats, multi_m, deltas, G)
    out = edge_weights_chw(_to_chw(feats), multi_m, n_graphs=G,
                           true_h=H, true_w=W, deltas=deltas, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_w_chw(weights)),
                               atol=1e-5)


def test_rethresh_chw_diamond12_reflect():
    rng = np.random.RandomState(10)
    deltas = WINDOWS["diamond12"]
    x = jnp.asarray(rng.randn(1, H, W, C), jnp.float32)
    feats = jnp.asarray(rng.randn(1, H, W, C), jnp.float32)
    multi_m = jnp.asarray(rng.rand(G, F) * 2 + 0.5, jnp.float32)
    w_gtv, _ = extract_edge_weights(feats, multi_m, deltas, G)
    sgtv = {k: jnp.asarray([v], jnp.float32)
            for k, v in (("p01", 1.0), ("p02a", 0.5), ("p02b", 0.5), ("p03", 0.5))}
    gamma = jnp.asarray(rng.rand(G) * 0.5 + 0.05, jnp.float32)
    ro = jnp.asarray(rng.rand(G) + 0.1, jnp.float32)
    y = jnp.asarray(rng.randn(1, H, W, C), jnp.float32)

    gamma_c = jnp.repeat(gamma, F)
    eps = op_c(x, w_gtv, deltas, G, sgtv, "reflect")
    t = tuple(2.0 * soft_threshold(e, gamma_c) - e for e in eps)
    ref = y + per_graph_scale(op_c_transpose(t, w_gtv, deltas, G, sgtv), ro)
    out = gtv_rethresh_chw(
        _to_chw(x), _to_chw(y), _w_chw(w_gtv), _stats_pg(sgtv, G, F),
        gamma, ro, n_graphs=G, true_h=H, true_w=W, deltas=deltas,
        stats_mode="reflect", interpret=True)
    np.testing.assert_allclose(np.asarray(_to_chw(ref)), np.asarray(out),
                               atol=5e-4)


def test_pixel_solver_chw_matches_jnp():
    """MixtureGTV (pixel family) with use_pallas_unroll matches the jnp
    path: diamond-12 window, reflect stats, accumulating-bias ADMM round,
    DC estimator + mixture combination."""
    from irdu_tpu.solvers.pixel_gtv import MixtureGTV

    rng = np.random.RandomState(11)
    h, w = 16, 128
    x = jnp.asarray(rng.rand(1, h, w, 3) * 0.8, jnp.float32)
    ref_m = MixtureGTV(n_graphs=4, n_node_fts=3, n_cnn_fts=8,
                       feature_num_blocks=(1, 1, 1, 1),
                       feature_num_refinement=1)
    params = ref_m.init(jax.random.PRNGKey(1), x)
    ref = ref_m.apply(params, x)
    out = MixtureGTV(n_graphs=4, n_node_fts=3, n_cnn_fts=8,
                     feature_num_blocks=(1, 1, 1, 1),
                     feature_num_refinement=1,
                     use_pallas_unroll=True).apply(params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# fused whole-step kernel (gg_fused_step_chw) vs compositions of the
# individually-verified kernels above
# ---------------------------------------------------------------------------

from irdu_tpu.ops.pallas.solver_chw import (  # noqa: E402
    box_down_chw,
    box_up_chw,
    fused_scal,
    gg_fused_step_chw,
)

H2S = 32  # two-scale fused path needs H % 16 == 0


def _mk2(rng, h, w):
    """Full-res + half-res weights and stats for the two-scale system."""
    x = jnp.asarray(rng.randn(1, h, w, C), jnp.float32)
    f0 = jnp.asarray(rng.randn(1, h, w, C), jnp.float32)
    f1 = jnp.asarray(rng.randn(1, h // 2, w // 2, C), jnp.float32)
    mm = jnp.asarray(rng.rand(G, F) * 2 + 0.5, jnp.float32)
    wgtv0, _ = extract_edge_weights(f0, mm, DELTAS, G)
    wglr0, _ = extract_edge_weights(f0 + 0.2, mm, DELTAS, G)
    wgtv1, _ = extract_edge_weights(f1, mm, DELTAS, G)
    wglr1, _ = extract_edge_weights(f1 - 0.1, mm, DELTAS, G)
    return x, (_w_chw(wgtv0), _w_chw(wglr0), _w_chw(wgtv1), _w_chw(wglr1))


def _scalars(rng):
    mk = lambda lo: jnp.asarray(rng.rand(G) + lo, jnp.float32)
    return dict(mu0=mk(0.1), ro0=mk(0.1), mu1=mk(0.05), ro1=mk(0.05),
                alpha=mk(0.2), beta=mk(0.1), gamma0=mk(0.05) * 0.5,
                gamma1=mk(0.05) * 0.5)


def test_fused_rhs_two_scale():
    rng = np.random.RandomState(20)
    x, (wgtv0, wglr0, wgtv1, wglr1) = _mk2(rng, H2S, W)
    sgtv0, sgtv1 = _rand_stats(rng), _rand_stats(rng)
    p0, p1 = _stats_pg(sgtv0, G, F), _stats_pg(sgtv1, G, F)
    s = _scalars(rng)
    xc = _to_chw(x)

    ref = (gg_matvec_chw(xc, None, wgtv0, None, p0,
                         s["ro0"] * 0, s["ro0"], n_graphs=G, true_h=H2S,
                         true_w=W, with_glr=False, interpret=True)
           + box_up_chw(gg_matvec_chw(
               box_down_chw(xc), None, wgtv1, None, p1, s["ro1"] * 0,
               s["ro1"], n_graphs=G, true_h=H2S // 2, true_w=W // 2,
               with_glr=False, add_identity=False, interpret=True)))
    out = gg_fused_step_chw(
        xc, None, None, wgtv0, None, wgtv1, None, p0, None, p1, None,
        fused_scal(G, ro0=s["ro0"], ro1=s["ro1"]),
        mode="rhs", n_graphs=G, true_h=H2S, true_w=W, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-4)


def test_fused_cg_two_scale_with_momentum():
    rng = np.random.RandomState(21)
    x, (wgtv0, wglr0, wgtv1, wglr1) = _mk2(rng, H2S, W)
    sglr0, sgtv0 = _rand_stats(rng), _rand_stats(rng)
    sglr1, sgtv1 = _rand_stats(rng), _rand_stats(rng)
    pglr0, pgtv0 = _stats_pg(sglr0, G, F), _stats_pg(sgtv0, G, F)
    pglr1, pgtv1 = _stats_pg(sglr1, G, F), _stats_pg(sgtv1, G, F)
    s = _scalars(rng)
    xc = _to_chw(x)
    rhs = _to_chw(jnp.asarray(rng.randn(1, H2S, W, C) * 0.5, jnp.float32))
    prev = _to_chw(jnp.asarray(rng.randn(1, H2S, W, C) * 0.5, jnp.float32))

    ax = (gg_matvec_chw(xc, wglr0, wgtv0, pglr0, pgtv0, s["mu0"], s["ro0"],
                        n_graphs=G, true_h=H2S, true_w=W, interpret=True)
          + box_up_chw(gg_matvec_chw(
              box_down_chw(xc), wglr1, wgtv1, pglr1, pgtv1, s["mu1"],
              s["ro1"], n_graphs=G, true_h=H2S // 2, true_w=W // 2,
              add_identity=False, interpret=True)))
    a_c = jnp.repeat(s["alpha"], F)[None, :, None, None]
    b_c = jnp.repeat(s["beta"], F)[None, :, None, None]
    upd_ref = rhs - ax + b_c * prev
    out_ref = xc + a_c * upd_ref

    scal = fused_scal(G, mu0=s["mu0"], ro0=s["ro0"], mu1=s["mu1"],
                      ro1=s["ro1"], alpha=s["alpha"], beta=s["beta"])
    out, upd = gg_fused_step_chw(
        xc, rhs, prev, wgtv0, wglr0, wgtv1, wglr1,
        pgtv0, pglr0, pgtv1, pglr1, scal,
        mode="cg", n_graphs=G, true_h=H2S, true_w=W, emit_update=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(upd_ref), np.asarray(upd), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out), atol=3e-4)


def test_fused_cg_use_x_rhs_single_scale():
    """Pixel-family style: single scale, diamond-12 + reflect, x as RHS."""
    rng = np.random.RandomState(22)
    deltas = WINDOWS["diamond12"]
    x = jnp.asarray(rng.randn(1, H2S, W, C), jnp.float32)
    feats = jnp.asarray(rng.randn(1, H2S, W, C), jnp.float32)
    mm = jnp.asarray(rng.rand(G, F) * 2 + 0.5, jnp.float32)
    wgtv, _ = extract_edge_weights(feats, mm, deltas, G)
    wglr, _ = extract_edge_weights(feats + 0.3, mm, deltas, G)
    sglr = {k: jnp.asarray([v], jnp.float32)
            for k, v in (("p01", 1.0), ("p02a", 0.5), ("p02b", 0.5), ("p03", 0.5))}
    sgtv = {k: jnp.asarray([v - 0.2], jnp.float32)
            for k, v in (("p01", 1.0), ("p02a", 0.5), ("p02b", 0.5), ("p03", 0.5))}
    pglr, pgtv = _stats_pg(sglr, G, F), _stats_pg(sgtv, G, F)
    s = _scalars(rng)
    xc = _to_chw(x)
    wgtv_c, wglr_c = _w_chw(wgtv), _w_chw(wglr)

    ax = gg_matvec_chw(xc, wglr_c, wgtv_c, pglr, pgtv, s["mu0"], s["ro0"],
                       n_graphs=G, true_h=H2S, true_w=W, deltas=deltas,
                       stats_mode="reflect", interpret=True)
    a_c = jnp.repeat(s["alpha"], F)[None, :, None, None]
    out_ref = xc + a_c * (xc - ax)

    scal = fused_scal(G, mu0=s["mu0"], ro0=s["ro0"], alpha=s["alpha"])
    out = gg_fused_step_chw(
        xc, None, None, wgtv_c, wglr_c, None, None, pgtv, pglr, None, None,
        scal, mode="cg", n_graphs=G, true_h=H2S, true_w=W, deltas=deltas,
        stats_mode="reflect", use_x_rhs=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out), atol=3e-4)


def test_fused_rethresh_two_scale():
    rng = np.random.RandomState(23)
    x, (wgtv0, wglr0, wgtv1, wglr1) = _mk2(rng, H2S, W)
    sgtv0, sgtv1 = _rand_stats(rng), _rand_stats(rng)
    p0, p1 = _stats_pg(sgtv0, G, F), _stats_pg(sgtv1, G, F)
    s = _scalars(rng)
    xc = _to_chw(x)
    y = _to_chw(jnp.asarray(rng.randn(1, H2S, W, C), jnp.float32))

    ref = (gtv_rethresh_chw(xc, y, wgtv0, p0, s["gamma0"], s["ro0"],
                            n_graphs=G, true_h=H2S, true_w=W, interpret=True)
           + box_up_chw(gtv_rethresh_chw(
               box_down_chw(xc), None, wgtv1, p1, s["gamma1"], s["ro1"],
               n_graphs=G, true_h=H2S // 2, true_w=W // 2, interpret=True)))
    scal = fused_scal(G, ro0=s["ro0"], ro1=s["ro1"],
                      gamma0=s["gamma0"], gamma1=s["gamma1"])
    out = gg_fused_step_chw(
        xc, y, None, wgtv0, None, wgtv1, None, p0, None, p1, None, scal,
        mode="rethresh", n_graphs=G, true_h=H2S, true_w=W, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-4)


def test_fused_padded_matches_true_extent():
    """Lane/band padding: fused two-scale cg on a padded canvas must
    reproduce the true-extent result in the valid region."""
    rng = np.random.RandomState(24)
    x, (wgtv0, wglr0, wgtv1, wglr1) = _mk2(rng, H2S, W)
    sglr0, sgtv0 = _rand_stats(rng), _rand_stats(rng)
    sglr1, sgtv1 = _rand_stats(rng), _rand_stats(rng)
    pglr0, pgtv0 = _stats_pg(sglr0, G, F), _stats_pg(sgtv0, G, F)
    pglr1, pgtv1 = _stats_pg(sglr1, G, F), _stats_pg(sgtv1, G, F)
    s = _scalars(rng)
    scal = fused_scal(G, mu0=s["mu0"], ro0=s["ro0"], mu1=s["mu1"],
                      ro1=s["ro1"], alpha=s["alpha"])
    xc = _to_chw(x)
    rhs = _to_chw(jnp.asarray(rng.randn(1, H2S, W, C) * 0.5, jnp.float32))
    kw = dict(mode="cg", n_graphs=G, true_h=H2S, true_w=W, interpret=True)
    ref = gg_fused_step_chw(xc, rhs, None, wgtv0, wglr0, wgtv1, wglr1,
                            pgtv0, pglr0, pgtv1, pglr1, scal, **kw)

    ph, pw = 16, 32
    xp = _pad(xc, ph, pw, axes=(2, 3))
    rp = _pad(rhs, ph, pw, axes=(2, 3))
    w0p = [_pad(a, ph, pw, axes=(3, 4)) for a in (wgtv0, wglr0)]
    w1p = [_pad(a, ph // 2, pw // 2, axes=(3, 4)) for a in (wgtv1, wglr1)]
    out = gg_fused_step_chw(xp, rp, None, w0p[0], w0p[1], w1p[0], w1p[1],
                            pgtv0, pglr0, pgtv1, pglr1, scal, **kw)
    np.testing.assert_allclose(np.asarray(ref),
                               np.asarray(out[:, :, :H2S, :W]), atol=3e-4)
