"""Pallas kernels vs their jnp twins (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irdu_tpu.models.blocks import LocalNonLinearBlock
from irdu_tpu.ops.pallas.gated_block import fused_gated_block, gated_block_reference


@pytest.fixture
def block_params(rng):
    C, HID = 8, 12
    return dict(
        x=jnp.asarray(rng.randn(2, 16, 16, C).astype(np.float32)),
        scale=jnp.asarray(rng.randn(C).astype(np.float32)),
        w1=jnp.asarray((rng.randn(C, 2 * HID) * 0.2).astype(np.float32)),
        dwk=jnp.asarray((rng.randn(3, 3, 2 * HID) * 0.2).astype(np.float32)),
        w2=jnp.asarray((rng.randn(HID, C) * 0.2).astype(np.float32)),
        skip=jnp.asarray(np.array([0.8, 0.5], np.float32)),
    )


def test_fused_gated_block_matches_reference(block_params):
    p = block_params
    ref = gated_block_reference(p["x"], p["scale"], p["w1"], p["dwk"], p["w2"], p["skip"])
    out = fused_gated_block(
        p["x"], p["scale"], p["w1"], p["dwk"], p["w2"], p["skip"],
        tile_h=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_gated_block_matches_flax_block(block_params):
    p = block_params
    C, HID = 8, 12
    blk = LocalNonLinearBlock(C, HID)
    params = {"params": {
        "skip_weight": p["skip"],
        "norm": {"weighted_transform": p["scale"]},
        "local_linear": {
            "channels_linear_op": {"kernel": p["w1"]},
            "channels_local_linear_op": {"kernel": p["dwk"].reshape(3, 3, 1, 2 * HID)},
            "project_out": {"kernel": p["w2"]},
        },
    }}
    blk_out = blk.apply(params, p["x"])
    out = fused_gated_block(
        p["x"], p["scale"], p["w1"], p["dwk"], p["w2"], p["skip"],
        tile_h=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(blk_out), atol=2e-5, rtol=1e-4)


def test_use_pallas_flag_params_identical(rng):
    """The pallas-enabled module has the exact same param tree (it routes
    at call time, params are shared)."""
    a = LocalNonLinearBlock(8, 12, use_pallas=False)
    b = LocalNonLinearBlock(8, 12, use_pallas=True)
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    pa = jax.jit(a.init)(jax.random.PRNGKey(0), x)
    pb = jax.jit(b.init)(jax.random.PRNGKey(0), x)
    sa = jax.tree_util.tree_map(lambda t: t.shape, pa)
    sb = jax.tree_util.tree_map(lambda t: t.shape, pb)
    assert sa == sb


def test_fused_system_matvec_matches_ops(rng):
    from irdu_tpu.ops.graph import extract_edge_weights, glr_apply, gtv_apply, per_graph_scale
    from irdu_tpu.ops.pallas.solver_matvec import fused_system_matvec
    from irdu_tpu.ops.windows import EDGE_DELTAS_CROSS4 as D

    G, F = 2, 4
    C = G * F
    B, H, W = 2, 32, 16
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    mm = jnp.asarray(rng.rand(G, F).astype(np.float32) + 0.5)
    wglr, _ = extract_edge_weights(feats, mm, D, G)
    wgtv, _ = extract_edge_weights(feats * 1.3 + 0.1, mm, D, G)
    sglr = {k: jnp.asarray(rng.randn(C).astype(np.float32))
            for k in ("p01", "p02a", "p02b", "p03")}
    sgtv = {k: jnp.asarray(rng.randn(C).astype(np.float32))
            for k in ("p01", "p02a", "p02b", "p03")}
    mu = jnp.asarray(np.abs(rng.randn(G)).astype(np.float32))
    ro = jnp.asarray(np.abs(rng.randn(G)).astype(np.float32))

    ref = (x + per_graph_scale(glr_apply(x, wglr, D, G, sglr), mu)
           + per_graph_scale(gtv_apply(x, wgtv, D, G, sgtv), ro))
    stk = lambda s: jnp.stack([s["p01"], s["p02a"], s["p02b"], s["p03"]])
    out = fused_system_matvec(
        x, wglr, wgtv, stk(sglr), stk(sgtv),
        jnp.repeat(mu, F), jnp.repeat(ro, F),
        n_graphs=G, tile_h=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)
