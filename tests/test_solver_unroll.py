"""Interpret-mode parity of the whole-unroll CHW kernel
(ops/pallas/solver_unroll) against the authoritative jnp solver path
(solvers/gtv_glr.MixtureGTVGLR with use_pallas_unroll=False)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irdu_tpu.solvers import gtv_glr as gtv_glr_mod
from irdu_tpu.solvers.gtv_glr import MixtureGTVGLR

G, F = 2, 3
C = G * F


def _model_pair(h, w, seed=0, **kw):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(1, h, w, C) * 0.3, jnp.float32)
    ref_m = MixtureGTVGLR(n_graphs=G, n_node_fts=F, **kw)
    params = ref_m.init(jax.random.PRNGKey(0), x)
    # randomize the log-params so μ/ρ/γ are not at their tiny inits
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.asarray(
            np.random.RandomState(seed + 1).randn(*a.shape), a.dtype),
        params)
    return x, ref_m, params, kw


def _check(h, w, seed=0, **kw):
    x, ref_m, params, kw = _model_pair(h, w, seed=seed, **kw)
    fast_m = MixtureGTVGLR(n_graphs=G, n_node_fts=F,
                           use_pallas_unroll=True, **kw)
    assert fast_m._mega_ok(x.shape), "test shape must qualify for the mega path"
    ref = ref_m.apply(params, x)
    out = fast_m.apply(params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=5e-4, rtol=1e-3)


def test_unroll_matches_jnp():
    _check(16, 256)


def test_unroll_padded_halfres_matches():
    """W = 128 → half-res width 64 < the 128-lane DMA minimum: the
    half-res features/weights ride lane-padded (flagship scale2 shape
    class). The pad columns must not leak into the true region."""
    _check(32, 128, seed=3)


def test_unroll_padded_fullres_matches():
    """W = 64 < the 128-lane DMA minimum: the FULL-res plane itself rides
    lane-padded (flagship scale3 shape class) — every W shift masks at
    true_w, the in-kernel box down/up confines pad→pad, and the output is
    cropped back."""
    _check(32, 64, seed=4)


def test_unroll_padded_fullres_nonmultiple():
    """W = 96: padded to 128 with a non-power-of-two true width (the /16
    eval-protocol shape class)."""
    _check(16, 96, seed=6)


def test_unroll_padded_fullres_chw_in():
    x, ref_m, params, _ = _model_pair(32, 64, seed=8)
    ref = ref_m.apply(params, x)
    fast_m = MixtureGTVGLR(n_graphs=G, n_node_fts=F, use_pallas_unroll=True)
    out = fast_m.apply(params, jnp.transpose(x, (0, 3, 1, 2)), chw=True)
    np.testing.assert_allclose(np.asarray(ref),
                               np.asarray(jnp.transpose(out, (0, 2, 3, 1))),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("k", [1, 2])
def test_unroll_truncated_cg(k):
    _check(16, 256, seed=5, eval_cg_iters=k)


def test_unroll_chw_in_matches():
    """The model-level CHW entry (chw=True) through the mega path."""
    x, ref_m, params, _ = _model_pair(16, 256, seed=7)
    ref = ref_m.apply(params, x)
    fast_m = MixtureGTVGLR(n_graphs=G, n_node_fts=F, use_pallas_unroll=True)
    out = fast_m.apply(params, jnp.transpose(x, (0, 3, 1, 2)), chw=True)
    np.testing.assert_allclose(np.asarray(ref),
                               np.asarray(jnp.transpose(out, (0, 2, 3, 1))),
                               atol=5e-4, rtol=1e-3)


def _pixel_pair(seed=11):
    from irdu_tpu.solvers.pixel_gtv import MixtureGTV

    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(1, 16, 128, 3) * 0.8, jnp.float32)
    kw = dict(n_graphs=4, n_node_fts=3, n_cnn_fts=8,
              feature_num_blocks=(1, 1, 1, 1), feature_num_refinement=1)
    ref_m = MixtureGTV(**kw)
    params = ref_m.init(jax.random.PRNGKey(1), x)
    fast_m = MixtureGTV(use_pallas_unroll=True, **kw)
    return x, ref_m, fast_m, params


def test_pixel_unroll_mega_matches():
    """MixtureGTV routes through the pixel whole-unroll kernel at
    qualifying shapes (diamond-12, reflect stats, accumulating bias)."""
    x, ref_m, fast_m, params = _pixel_pair()
    assert fast_m._mega_ok(x.shape)
    np.testing.assert_allclose(np.asarray(ref_m.apply(params, x)),
                               np.asarray(fast_m.apply(params, x)),
                               atol=1e-4, rtol=1e-3)


def test_pixel_band_path_still_matches(monkeypatch):
    monkeypatch.setattr(gtv_glr_mod, "_MEGA_MAX_PIXELS", 0)
    x, ref_m, fast_m, params = _pixel_pair(seed=13)
    assert not fast_m._mega_ok(x.shape)
    np.testing.assert_allclose(np.asarray(ref_m.apply(params, x)),
                               np.asarray(fast_m.apply(params, x)),
                               atol=1e-4, rtol=1e-3)


def test_band_path_still_matches(monkeypatch):
    """Forcing the per-step band kernels (mega disabled) must still match —
    the route big images take."""
    monkeypatch.setattr(gtv_glr_mod, "_MEGA_MAX_PIXELS", 0)
    x, ref_m, params, _ = _model_pair(16, 256, seed=9)
    fast_m = MixtureGTVGLR(n_graphs=G, n_node_fts=F, use_pallas_unroll=True)
    assert not fast_m._mega_ok(x.shape)
    ref = ref_m.apply(params, x)
    out = fast_m.apply(params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=5e-4, rtol=1e-3)
