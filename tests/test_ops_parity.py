"""Numeric parity of the L1 graph operators vs the torch reference.

Each test builds the reference GLRFast/GTVFast with randomized learnable
parameters, mirrors those parameters into our functional ops, and compares
outputs on random inputs to float32 tolerance.

Our ops are flat-channel NHWC (B,H,W,C), C = G·F; the torch reference is
(B,G,F,H,W). Converters below map between them.
"""

import numpy as np
import pytest

from conftest import requires_reference

import jax.numpy as jnp

from irdu_tpu.ops import (
    EDGE_DELTAS_CROSS4,
    extract_edge_weights,
    glr_apply,
    gtv_apply,
    op_c,
    op_c_transpose,
    op_l_norm,
    stats_conv,
    stats_conv_transpose,
)
from irdu_tpu.ops.graph import soft_threshold

B, G, F, H, W = 2, 3, 5, 12, 10
C = G * F
DELTAS = EDGE_DELTAS_CROSS4
E = len(DELTAS)


def _rand_stats(rng):
    """Per-channel stencil coefficients, flat (C,)."""
    return {
        name: jnp.asarray(rng.randn(C).astype(np.float32))
        for name in ("p01", "p02a", "p02b", "p03")
    }


def _torch_op(rng, cls):
    """Instantiate a reference GLRFast/GTVFast with random parameters and
    return (module, our mirrored multiM, flat stats)."""
    import torch

    mod = cls(n_node_fts=F, n_graphs=G)
    multi_m = rng.randn(G, F).astype(np.float32)
    stats = _rand_stats(rng)
    with torch.no_grad():
        mod.multiM.copy_(torch.from_numpy(multi_m.copy()))
        for name in ("p01", "p02a", "p02b", "p03"):
            arr = np.asarray(stats[name]).reshape(C, 1, 1, 1)
            getattr(mod, f"stats_kernel_{name}").copy_(torch.from_numpy(arr.copy()))
    return mod, jnp.asarray(multi_m), stats


def _flat(x_bghw):  # (B,G,F,H,W) numpy -> (B,H,W,C) jnp
    return jnp.asarray(np.ascontiguousarray(
        np.transpose(x_bghw, (0, 3, 4, 1, 2)).reshape(B, H, W, C)
    ))


def _to_torch_gchw(x_bghw):
    import torch

    return torch.from_numpy(np.ascontiguousarray(x_bghw))


def _from_torch_gchw(t):  # torch (B,G,F,H,W) -> numpy (B,H,W,C)
    return np.transpose(t.detach().numpy(), (0, 3, 4, 1, 2)).reshape(B, H, W, C)


@requires_reference
@pytest.mark.parametrize("cls_name", ["GLRFast", "GTVFast"])
def test_edge_weights_parity(rng, cls_name):
    import torch
    from torch_bridge import load_v1x0

    ref = load_v1x0()
    mod, multi_m, _ = _torch_op(rng, getattr(ref, cls_name))

    feats = rng.randn(B, G, F, H, W).astype(np.float32)
    w_ours, deg_ours = extract_edge_weights(_flat(feats), multi_m, DELTAS, G)

    with torch.no_grad():
        w_ref, deg_ref = mod.extract_edge_weights(_to_torch_gchw(feats))
    # ref: (B,G,E,H,W) -> (B,H,W,G,E)
    w_ref = np.transpose(w_ref.numpy(), (0, 3, 4, 1, 2))
    deg_ref = np.transpose(deg_ref.numpy(), (0, 2, 3, 1))

    np.testing.assert_allclose(np.asarray(w_ours), w_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(deg_ours), deg_ref, atol=1e-5, rtol=1e-5)


@requires_reference
def test_stats_conv_parity(rng):
    import torch
    from torch_bridge import load_v1x0

    ref = load_v1x0()
    mod, _, stats = _torch_op(rng, ref.GLRFast)

    x = rng.randn(B, G, F, H, W).astype(np.float32)
    ours = stats_conv(_flat(x), stats)
    ours_t = stats_conv_transpose(_flat(x), stats)
    with torch.no_grad():
        theirs = _from_torch_gchw(mod.stats_conv(_to_torch_gchw(x)))
        theirs_t = _from_torch_gchw(mod.stats_conv_transpose(_to_torch_gchw(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_t), theirs_t, atol=1e-5, rtol=1e-5)


@requires_reference
def test_glr_forward_parity(rng):
    import torch
    from torch_bridge import load_v1x0

    ref = load_v1x0()
    mod, multi_m, stats = _torch_op(rng, ref.GLRFast)

    feats = rng.randn(B, G, F, H, W).astype(np.float32)
    x = rng.randn(B, G, F, H, W).astype(np.float32)

    w, _ = extract_edge_weights(_flat(feats), multi_m, DELTAS, G)
    ours_l = op_l_norm(_flat(x), w, DELTAS, G)
    ours_fwd = glr_apply(_flat(x), w, DELTAS, G, stats)

    with torch.no_grad():
        w_ref, deg_ref = mod.extract_edge_weights(_to_torch_gchw(feats))
        theirs_l = _from_torch_gchw(mod.op_L_norm(_to_torch_gchw(x), w_ref, deg_ref))
        theirs_fwd = _from_torch_gchw(mod(_to_torch_gchw(x), w_ref, deg_ref))

    np.testing.assert_allclose(np.asarray(ours_l), theirs_l, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_fwd), theirs_fwd, atol=1e-4, rtol=1e-4)


@requires_reference
def test_gtv_ops_parity(rng):
    import torch
    from torch_bridge import load_v1x0

    ref = load_v1x0()
    mod, multi_m, stats = _torch_op(rng, ref.GTVFast)

    feats = rng.randn(B, G, F, H, W).astype(np.float32)
    x = rng.randn(B, G, F, H, W).astype(np.float32)
    eps = rng.randn(E, B, G, F, H, W).astype(np.float32)

    w, _ = extract_edge_weights(_flat(feats), multi_m, DELTAS, G)
    ours_c = op_c(_flat(x), w, DELTAS, G, stats)
    eps_ours = tuple(_flat(eps[e]) for e in range(E))
    ours_ct = op_c_transpose(eps_ours, w, DELTAS, G, stats)
    ours_fwd = gtv_apply(_flat(x), w, DELTAS, G, stats)

    with torch.no_grad():
        w_ref, deg_ref = mod.extract_edge_weights(_to_torch_gchw(feats))
        theirs_c = mod.op_C(_to_torch_gchw(x), w_ref, deg_ref)
        # (B,G,F,E,H,W): edge axis 3
        theirs_c_np = theirs_c.numpy()
        eps_t = torch.from_numpy(np.ascontiguousarray(np.transpose(eps, (1, 2, 3, 0, 4, 5))))
        theirs_ct = _from_torch_gchw(mod.op_C_transpose(eps_t, w_ref, deg_ref))
        theirs_fwd = _from_torch_gchw(mod(_to_torch_gchw(x), w_ref, deg_ref))

    for e in range(E):
        theirs_e = np.transpose(theirs_c_np[:, :, :, e], (0, 3, 4, 1, 2)).reshape(B, H, W, C)
        np.testing.assert_allclose(np.asarray(ours_c[e]), theirs_e, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_ct), theirs_ct, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_fwd), theirs_fwd, atol=1e-4, rtol=1e-4)


@requires_reference
def test_soft_threshold_parity(rng):
    import torch
    from torch_bridge import load_v1x0

    ref = load_v1x0()
    solver = ref.MixtureGTVGLR(
        n_graphs=G,
        n_node_fts=F,
        alpha_init=0.5,
        beta_init=0.1,
        muy_init=torch.tensor([[0.001], [0.0001]]),
        ro_init=torch.tensor([[0.0001], [0.0001]]),
        gamma_init=torch.tensor([[0.0001], [0.0001]]),
    )
    delta = rng.randn(E, B, G, F, H, W).astype(np.float32)
    gamma = np.abs(rng.randn(G)).astype(np.float32)
    gamma_c = jnp.repeat(jnp.asarray(gamma), F)

    with torch.no_grad():
        delta_t = torch.from_numpy(np.ascontiguousarray(np.transpose(delta, (1, 2, 3, 0, 4, 5))))
        theirs = solver.soft_threshold(delta_t, torch.from_numpy(gamma)).numpy()
    for e in range(E):
        ours = soft_threshold(_flat(delta[e]), gamma_c)
        theirs_e = np.transpose(theirs[:, :, :, e], (0, 3, 4, 1, 2)).reshape(B, H, W, C)
        np.testing.assert_allclose(np.asarray(ours), theirs_e, atol=1e-6, rtol=1e-6)


def test_adjointness_c_ct(rng):
    """The difference operator D (op_c with unit weights, no stats) and its
    scatter Dᵀ (op_c_transpose with unit weights) satisfy ⟨Dx, ε⟩ = ⟨x, Dᵀε⟩
    exactly for interior-supported ε. (The reference's op_C_transpose applies
    the edge weights to its *input*, so C/Cᵀ themselves are adjoint w.r.t. a
    w-weighted inner product, not the plain one — this pins the identity the
    unroll actually relies on.)"""
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    eps = rng.randn(E, B, H, W, C).astype(np.float32)
    eps[:, :, 0, :], eps[:, :, -1, :] = 0.0, 0.0
    eps[:, :, :, 0], eps[:, :, :, -1] = 0.0, 0.0
    eps_t = tuple(jnp.asarray(eps[e]) for e in range(E))
    ones_w = jnp.ones((B, H, W, G, E))

    cx = op_c(x, ones_w, DELTAS, G, None)
    ct_eps = op_c_transpose(eps_t, ones_w, DELTAS, G, None)

    lhs = sum(float(jnp.sum(cx[e] * eps_t[e])) for e in range(E))
    rhs = float(jnp.sum(x * ct_eps))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_edge_weights_are_row_stochastic(rng):
    feats = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w, deg = extract_edge_weights(feats, jnp.ones((G, F)) * 0.4, DELTAS, G)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=-1)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(deg), 1.0, atol=1e-6)
    assert np.all(np.asarray(w) > 0)


def test_laplacian_annihilates_constants(rng):
    """L·1 = 0 for row-stochastic weights (the defining smoothness property)."""
    feats = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w, _ = extract_edge_weights(feats, jnp.ones((G, F)), DELTAS, G)
    ones = jnp.ones((B, H, W, C))
    out = op_l_norm(ones, w, DELTAS, G)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
