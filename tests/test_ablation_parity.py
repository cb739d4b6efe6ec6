"""Torch-reference parity for the remaining ablation variants:
no_orders_split, no_orders_noGTV, no_latent, no_latent_no_mixture."""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp


def _randomize(tm, torch):
    with torch.no_grad():
        for name in ("GTVmodule00", "GLRmodule00", "GTVmodule01", "GLRmodule01"):
            mod = getattr(tm, name, None)
            if mod is not None:
                mod.multiM.copy_(torch.rand_like(mod.multiM) + 0.5)
        tm.alphaCGD.copy_(torch.rand_like(tm.alphaCGD) * 0.5)
        tm.betaCGD.copy_(torch.rand_like(tm.betaCGD) * 0.2)


def _tree_check(init_params, converted):
    init_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(init_params["params"])}
    conv_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(converted)}
    assert init_paths == conv_paths, set(init_paths) ^ set(conv_paths)


def _compare(model, converted, tm, x, torch, atol=2e-4):
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))))
    ours = np.asarray(model.apply({"params": converted}, jnp.asarray(x)))
    np.testing.assert_allclose(
        ours, ref_out.numpy().transpose(0, 2, 3, 1), atol=atol, rtol=1e-3)


@requires_reference
def test_no_orders_split_parity(rng):
    import torch
    from solver_bridge import convert_solver_state
    from torch_bridge import load_lib

    from irdu_tpu.solvers.ablation_solvers import GTVGLRSingleScale

    ref = load_lib("v13_no_orders_split")
    torch.manual_seed(2)
    tm = ref.GTVGLR(n_graphs=1, n_node_fts=12, alpha_init=0.5, beta_init=0.1,
                    muy_init=torch.tensor([[0.001]]), ro_init=torch.tensor([[1e-6]]),
                    gamma_init=torch.tensor([[1e-6]]))
    tm.eval()
    _randomize(tm, torch)

    model = GTVGLRSingleScale(n_graphs=1, n_node_fts=12, split_heads=True)
    x = rng.rand(1, 16, 16, 12).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = convert_solver_state(tm.state_dict(), ngraphs=1)
    _tree_check(init_params, converted)
    _compare(model, converted, tm, x, torch)


@requires_reference
def test_no_orders_nogtv_parity(rng):
    import torch
    from solver_bridge import convert_solver_state
    from torch_bridge import load_lib

    from irdu_tpu.solvers.ablation_solvers import GLRSingleScale

    ref = load_lib("v13_no_orders_noGTV")
    torch.manual_seed(2)
    tm = ref.GLR(n_graphs=1, n_node_fts=12, alpha_init=0.5, beta_init=0.1,
                 muy_init=torch.tensor([[0.001]]))
    tm.eval()
    _randomize(tm, torch)

    model = GLRSingleScale(n_graphs=1, n_node_fts=12)
    x = rng.rand(1, 16, 16, 12).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = convert_solver_state(tm.state_dict(), ngraphs=1)
    _tree_check(init_params, converted)
    _compare(model, converted, tm, x, torch)


@requires_reference
def test_no_latent_parity(rng):
    """MultiScaleGraphFilter (no_latent): replicate + flagship solver + 1×1."""
    import torch
    from flagship_bridge import _pointwise, _set
    from solver_bridge import convert_solver_state
    from torch_bridge import load_lib

    from irdu_tpu.models.ablations import MultiScaleGraphFilter

    ref = load_lib("v13_no_latent")
    torch.manual_seed(4)
    tm = ref.MultiScaleGraphFilter(n_channels_in=3, n_channels_out=3, ngraphs=4)
    tm.eval()
    with torch.no_grad():
        for name in ("GTVmodule00", "GLRmodule00", "GTVmodule01", "GLRmodule01"):
            mod = getattr(tm.localfilter, name)
            mod.multiM.copy_(torch.rand_like(mod.multiM) + 0.5)

    model = MultiScaleGraphFilter(ngraphs=4)
    x = rng.rand(1, 16, 16, 3).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    lf_sd = {k[len("localfilter."):]: v for k, v in tm.state_dict().items()
             if k.startswith("localfilter.")}
    converted = {"localfilter": convert_solver_state(lf_sd, ngraphs=4)}
    _set(converted, ("linear_combination", "kernel"),
         _pointwise(tm.state_dict()["linear_combination.weight"].numpy()))
    _tree_check(init_params, converted)
    _compare(model, converted, tm, x, torch)


@requires_reference
def test_no_latent_no_mixture_parity(rng):
    """OneGraphFilter with the two-scale nonlinear-head GTVGLR solver."""
    import torch
    from flagship_bridge import _pointwise, _set
    from solver_bridge import convert_solver_state
    from torch_bridge import load_lib

    from irdu_tpu.models.ablations import OneGraphFilter

    ref = load_lib("v13_no_latent_no_mixture")
    torch.manual_seed(5)
    tm = ref.OneGraphFilter(n_channels_in=3, n_channels_hidden=12, n_channels_out=3)
    tm.eval()
    with torch.no_grad():
        for name in ("GTVmodule00", "GLRmodule00", "GTVmodule01", "GLRmodule01"):
            mod = getattr(tm.localfilter, name)
            mod.multiM.copy_(torch.rand_like(mod.multiM) + 0.5)

    model = OneGraphFilter(n_channels_hidden=12, solver="two_scale_nl")
    x = rng.rand(1, 16, 16, 3).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    lf_sd = {k[len("localfilter."):]: v for k, v in tm.state_dict().items()
             if k.startswith("localfilter.")}
    converted = {"localfilter": convert_solver_state(lf_sd, ngraphs=1)}
    _set(converted, ("linear_combination", "kernel"),
         _pointwise(tm.state_dict()["linear_combination.weight"].numpy()))
    _tree_check(init_params, converted)
    _compare(model, converted, tm, x, torch)
