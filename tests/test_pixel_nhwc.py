"""NHWC lane-packed pixel-family unroll kernels vs the jnp path.

Interpret-mode parity (VERDICT r4 #4): the fused segment kernels
(ops/pallas/pixel_nhwc.py) must reproduce the authoritative jnp unroll
(solvers/pixel_gtv.MixtureGTV.__call__ — reference
model_GLR_GTV_deep_v6.py:936-1016) bit-close in f32. Two layers:

  * segment-level: pixel_unroll_nhwc against a planar-layout composition
    of the ops.graph flat functions (layout-agnostic shifts/elementwise,
    weights tiled F× on lanes = the planar broadcast);
  * model-level: MixtureGTV(use_nhwc_unroll=True) against the default
    path with identical params — covers feature extraction, packing,
    combination and the DC term.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irdu_tpu.ops.graph import (
    glr_apply_flat,
    gtv_apply_flat,
    op_c_flat,
    op_c_transpose_flat,
    soft_threshold,
)
from irdu_tpu.ops.pallas.pixel_nhwc import pixel_unroll_nhwc
from irdu_tpu.ops.windows import WINDOWS

G, F = 4, 3
C = G * F
H, W = 32, 128
DELTAS = tuple(tuple(d) for d in WINDOWS["diamond12"])


def _rand_inputs(seed=0):
    rng = np.random.RandomState(seed)
    y72 = rng.rand(1, H, W, C).astype(np.float32)
    w_gtv = rng.dirichlet(np.ones(len(DELTAS)),
                          size=(1, H, W, G)).astype(np.float32)
    w_glr = rng.dirichlet(np.ones(len(DELTAS)),
                          size=(1, H, W, G)).astype(np.float32)
    p = rng.rand(2, 4).astype(np.float32) * 0.5
    scal = {
        "mu": np.float32(rng.rand(G) * 0.2),
        "ro": np.float32(rng.rand(G) * 0.2),
        "gamma": np.float32(rng.rand(G) * 0.01 + 0.001),
        "alpha": np.float32(rng.rand(4, G) * 0.5),
        "beta": np.float32(rng.rand(4, G) * 0.2),
    }
    return y72, w_gtv, w_glr, p, scal


def _planar(scal_g):
    return jnp.tile(jnp.asarray(scal_g), F)


def _stats_dict(p_row):
    return {"p01": p_row[0:1], "p02a": p_row[1:2], "p02b": p_row[2:3],
            "p03": p_row[3:4]}


def _pack(w_eg):
    """(B,H,W,G,E) -> packed (B,H,W,E*G)."""
    b, h, w, g, e = w_eg.shape
    return jnp.asarray(w_eg).transpose(0, 1, 2, 4, 3).reshape(b, h, w, e * g)


def _flat(w_eg):
    """(B,H,W,G,E) -> tuple of E planar-tiled (B,H,W,C) arrays."""
    return tuple(jnp.tile(jnp.asarray(w_eg[..., e]), (1, 1, 1, F))
                 for e in range(w_eg.shape[-1]))


def _reference_unroll(y72, w_gtv_eg, w_glr_eg, p, scal):
    """The MixtureGTV unroll (solvers/pixel_gtv.py __call__ body) in
    planar layout via the flat ops."""
    wg, wl = _flat(w_gtv_eg), _flat(w_glr_eg)
    sg, sl = _stats_dict(jnp.asarray(p[0])), _stats_dict(jnp.asarray(p[1]))
    mu, ro, gamma = (_planar(scal["mu"]), _planar(scal["ro"]),
                     _planar(scal["gamma"]))
    a = [_planar(scal["alpha"][i]) for i in range(4)]
    b1, b3 = _planar(scal["beta"][1]), _planar(scal["beta"][3])
    y = jnp.asarray(y72)

    def matvec(x):
        return (x + mu * glr_apply_flat(x, wl, DELTAS, sl, "reflect")
                + ro * gtv_apply_flat(x, wg, DELTAS, sg, "reflect"))

    def rhs_of(eps_minus_bias):
        return ro * op_c_transpose_flat(eps_minus_bias, wg, DELTAS, sg) + y

    def cg_round(rhs, a0, bb, a1):
        out = rhs
        res = rhs - matvec(out)
        upd = res
        out = out + a0 * upd
        res = rhs - matvec(out)
        upd = res + bb * upd
        return out + a1 * upd

    eps = op_c_flat(y, wg, DELTAS, sg, "reflect")
    rhs = rhs_of(eps)
    out = cg_round(rhs, a[0], b1, a[1])
    cx = op_c_flat(out, wg, DELTAS, sg, "reflect")
    eps = tuple(soft_threshold(c, gamma) for c in cx)
    bias = tuple(c - e for c, e in zip(cx, eps))
    rhs = rhs_of(tuple(e - bb for e, bb in zip(eps, bias)))
    return cg_round(rhs, a[2], b3, a[3])


def _planar_scal(scal):
    return {
        "mu": _planar(scal["mu"]),
        "ro": _planar(scal["ro"]),
        "gamma": _planar(scal["gamma"]),
        "alpha": jnp.tile(jnp.asarray(scal["alpha"]), (1, F)),
        "beta": jnp.tile(jnp.asarray(scal["beta"]), (1, F)),
    }


def test_unroll_matches_flat_ops():
    y72, w_gtv, w_glr, p, scal = _rand_inputs()
    ref = np.asarray(_reference_unroll(y72, w_gtv, w_glr, p, scal))
    got = np.asarray(pixel_unroll_nhwc(
        jnp.asarray(y72), _pack(w_gtv), _pack(w_glr), jnp.asarray(p),
        _planar_scal(scal), n_graphs=G, deltas=DELTAS, tile_h=16,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_unroll_single_band():
    """H == tile_h: the whole image is one band (both halos out-of-image),
    so every boundary read takes the pad-mode fix path."""
    y72, w_gtv, w_glr, p, scal = _rand_inputs(1)
    y72, w_gtv, w_glr = y72[:, :16], w_gtv[:, :16], w_glr[:, :16]
    ref = np.asarray(_reference_unroll(y72, w_gtv, w_glr, p, scal))
    got = np.asarray(pixel_unroll_nhwc(
        jnp.asarray(y72), _pack(w_gtv), _pack(w_glr), jnp.asarray(p),
        _planar_scal(scal), n_graphs=G, deltas=DELTAS, tile_h=16,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_model_path_matches_jnp():
    from irdu_tpu.solvers.pixel_gtv import MixtureGTV

    kw = dict(n_graphs=G, n_node_fts=F, n_cnn_fts=8, window="diamond12",
              feature_num_blocks=(1, 1, 1, 1), feature_num_refinement=1)
    base = MixtureGTV(**kw)
    fast = MixtureGTV(use_nhwc_unroll=True, **kw)

    x = jnp.asarray(np.random.RandomState(2).rand(1, H, W, 3), jnp.float32)
    params = base.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(base.apply(params, x))
    got = np.asarray(fast.apply(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)
