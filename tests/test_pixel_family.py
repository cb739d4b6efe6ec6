"""Pixel-domain (v6) family: smoke + full parity vs the torch reference."""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from irdu_tpu.models.pixel import MultiScaleSequenceDenoiser
from irdu_tpu.solvers.pixel_gtv import MixtureGTV

TINY = dict(
    n_graphs=4,
    n_node_fts=3,
    n_cnn_fts=8,
    window="diamond12",
    n_cgd_iters=4,
)


def test_pixel_solver_smoke(rng):
    model = MixtureGTV(**TINY)
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_denoiser_top_smoke(rng):
    model = MultiScaleSequenceDenoiser(n_graphs=2, n_node_fts=3, n_cnn_fts=8)
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 3)


def test_pixel_remat_matches(rng):
    """remat=True (per-FFBlock + per-solver-segment rematerialization, the
    training-memory knob) must leave forward AND gradients unchanged."""
    base = MultiScaleSequenceDenoiser(n_graphs=2, n_node_fts=3, n_cnn_fts=8)
    rem = MultiScaleSequenceDenoiser(n_graphs=2, n_node_fts=3, n_cnn_fts=8,
                                     remat=True)
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    t = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    # init THROUGH the remat model: flax creates the graph-op submodule
    # params lazily, and doing so inside a jax.checkpoint trace used to
    # leak tracers (the trainer always inits the remat model)
    params = jax.jit(rem.init)(jax.random.PRNGKey(0), x)
    base_params = jax.jit(base.init)(jax.random.PRNGKey(0), x)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(base_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.testing.assert_allclose(
        np.asarray(base.apply(params, x)), np.asarray(rem.apply(params, x)),
        atol=1e-6)

    def loss(m):
        return lambda p: jnp.mean(jnp.abs(m.apply(p, x) - t))

    g1 = jax.grad(loss(base))(params)
    g2 = jax.grad(loss(rem))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@requires_reference
def test_pixel_solver_parity(rng):
    import torch
    from pixel_bridge import torch_to_flax_pixel
    from torch_bridge import load_lib

    ref = load_lib("v6")
    torch.manual_seed(0)
    window = np.array([
        0, 0, 1, 0, 0,
        0, 1, 1, 1, 0,
        1, 1, 0, 1, 1,
        0, 1, 1, 1, 0,
        0, 0, 1, 0, 0,
    ]).reshape(5, 5)
    tm = ref.MixtureGTV(
        nchannels_in=3,
        n_graphs=TINY["n_graphs"],
        n_node_fts=TINY["n_node_fts"],
        n_cnn_fts=TINY["n_cnn_fts"],
        connection_window=window,
        n_cgd_iters=4,
        alpha_init=0.5,
        beta_init=0.1,
        muy_init=torch.tensor([[0.1], [0.0], [0.0], [0.0]]),
        ro_init=torch.tensor([[0.1], [0.0], [0.0], [0.0]]),
        gamma_init=torch.tensor([[0.001], [1.0], [1.0], [1.0]]),
        device=torch.device("cpu"),
    )
    tm.eval()
    # randomize the interesting scalars so parity isn't tested at init-symmetry
    with torch.no_grad():
        for mod in (tm.GTVmodule00, tm.GLRmodule00):
            mod.multiM.copy_(torch.rand_like(mod.multiM) + 0.5)
            for p in ("p01", "p02a", "p02b", "p03"):
                getattr(mod, f"stats_kernel_{p}").copy_(
                    torch.rand_like(getattr(mod, f"stats_kernel_{p}")))
        tm.ro00.copy_(torch.rand_like(tm.ro00) * 0.2)
        tm.muys00.copy_(torch.rand_like(tm.muys00) * 0.2)
        tm.gamma00.copy_(torch.rand_like(tm.gamma00) * 0.1 - 4.0)
        tm.alphaCGD.copy_(torch.rand_like(tm.alphaCGD) * 0.5)
        tm.betaCGD.copy_(torch.rand_like(tm.betaCGD) * 0.2)

    model = MixtureGTV(**TINY)
    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = torch_to_flax_pixel(tm.state_dict())

    init_paths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(init_params["params"])
    }
    conv_paths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(converted)
    }
    assert init_paths == conv_paths, (
        set(init_paths) ^ set(conv_paths) or "shape mismatch"
    )

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = np.asarray(model.apply({"params": converted}, jnp.asarray(x)))
    np.testing.assert_allclose(
        ours, ref_out.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )


@requires_reference
def test_pixel_v4_parity(rng):
    """v4-era core (run_lightformer_GTVGLR.py:32): GLR/GTVFast WITHOUT
    stats stencils (model_GLR_GTV_deep_v4.py:275-472) — our
    stats_mode="none" path against the torch v4 MixtureGTV."""
    import torch
    from pixel_bridge import torch_to_flax_pixel
    from torch_bridge import load_lib

    ref = load_lib("v4")
    torch.manual_seed(0)
    window = np.array([
        0, 0, 1, 0, 0,
        0, 1, 1, 1, 0,
        1, 1, 0, 1, 1,
        0, 1, 1, 1, 0,
        0, 0, 1, 0, 0,
    ]).reshape(5, 5)
    tm = ref.MixtureGTV(
        nchannels_in=3,
        n_graphs=TINY["n_graphs"],
        n_node_fts=TINY["n_node_fts"],
        n_cnn_fts=TINY["n_cnn_fts"],
        connection_window=window,
        n_cgd_iters=4,
        alpha_init=0.5,
        beta_init=0.1,
        muy_init=torch.tensor([[0.1], [0.0], [0.0], [0.0]]),
        ro_init=torch.tensor([[0.1], [0.0], [0.0], [0.0]]),
        gamma_init=torch.tensor([[0.001], [1.0], [1.0], [1.0]]),
        device=torch.device("cpu"),
    )
    tm.eval()
    with torch.no_grad():
        for mod in (tm.GTVmodule00, tm.GLRmodule00):
            mod.multiM.copy_(torch.rand_like(mod.multiM) + 0.5)
        tm.ro00.copy_(torch.rand_like(tm.ro00) * 0.2)
        tm.muys00.copy_(torch.rand_like(tm.muys00) * 0.2)
        tm.gamma00.copy_(torch.rand_like(tm.gamma00) * 0.1 - 4.0)
        tm.alphaCGD.copy_(torch.rand_like(tm.alphaCGD) * 0.5)
        tm.betaCGD.copy_(torch.rand_like(tm.betaCGD) * 0.2)

    model = MixtureGTV(stats_mode="none", feature_n_levels=4, **TINY)
    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = torch_to_flax_pixel(tm.state_dict())

    init_paths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(init_params["params"])
    }
    conv_paths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(converted)
    }
    assert init_paths == conv_paths, (
        set(init_paths) ^ set(conv_paths) or "shape mismatch"
    )

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = np.asarray(model.apply({"params": converted}, jnp.asarray(x)))
    np.testing.assert_allclose(
        ours, ref_out.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )
