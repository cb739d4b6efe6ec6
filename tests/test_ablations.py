"""Ablation tops + GLR boosting pyramid: smoke tests (shape/finiteness),
plus parity of the no_orders single-scale solver vs the torch reference."""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from irdu_tpu.models.ablations import MultiScaleGraphFilter, OneGraphFilter
from irdu_tpu.models.glr_boosting import GLRBoostingPyramid


@pytest.mark.parametrize("solver", ["single", "single_split", "single_noGTV", "two_scale_nl"])
def test_one_graph_filter_smoke(rng, solver):
    model = OneGraphFilter(n_channels_hidden=12, solver=solver)
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_multiscale_graph_filter_smoke(rng):
    model = MultiScaleGraphFilter(ngraphs=2)
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 3)


def test_glr_boosting_smoke(rng):
    model = GLRBoostingPyramid(n_graphs=2, nchannels_abstract=4,
                               node_fts=(4, 4, 4, 4), level_features=(8, 8, 8, 8),
                               n_blocks=1, n_cgd_iters=2)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(y)))


@requires_reference
def test_no_orders_solver_parity(rng):
    """OneGraphFilter('single') forward == reference v13_no_orders
    OneGraphFilter under a converted state_dict."""
    import torch
    from flagship_bridge import _per_channel, _pointwise, _conv3x3, _set
    from torch_bridge import load_lib

    ref = load_lib("v13_no_orders")
    torch.manual_seed(1)
    tm = ref.OneGraphFilter(n_channels_in=3, n_channels_hidden=12, n_channels_out=3)
    tm.eval()
    with torch.no_grad():
        for mod in (tm.localfilter.GTVmodule00, tm.localfilter.GLRmodule00):
            mod.multiM.copy_(torch.rand_like(mod.multiM) + 0.5)
        tm.localfilter.alphaCGD.copy_(torch.rand_like(tm.localfilter.alphaCGD) * 0.5)
        tm.localfilter.betaCGD.copy_(torch.rand_like(tm.localfilter.betaCGD) * 0.2)

    model = OneGraphFilter(n_channels_hidden=12, solver="single")
    x = rng.rand(1, 16, 16, 3).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    tree = {}
    for name, tensor in tm.state_dict().items():
        w = tensor.detach().numpy()
        parts = name.split(".")
        if name == "linear_combination.weight":
            _set(tree, ("linear_combination", "kernel"), _pointwise(w))
            continue
        assert parts[0] == "localfilter"
        rest = parts[1:]
        lf = ("localfilter",)
        if rest[0] in ("alphaCGD", "betaCGD", "ro00", "gamma00", "muys00"):
            _set(tree, lf + (rest[0],), np.ascontiguousarray(w))
        elif rest[0] in ("GTVmodule00", "GLRmodule00"):
            _set(tree, lf + (rest[0], rest[1]), np.ascontiguousarray(w))
        elif rest[0] == "patchs_features_extraction00":
            idx = int(rest[1])
            if idx == 3:  # the 1x1 expand conv
                _set(tree, lf + ("patchs_features_extraction00", "expand", "kernel"),
                     _pointwise(w))
            else:
                blk = lf + ("patchs_features_extraction00", f"block_{idx}")
                sub = rest[2:]
                if sub == ["skip_weight"]:
                    _set(tree, blk + ("skip_weight",), np.ascontiguousarray(w))
                elif sub == ["norm", "weighted_transform", "weight"]:
                    _set(tree, blk + ("norm", "weighted_transform"), _per_channel(w))
                elif sub[0] == "local_linear":
                    conv = _conv3x3(w) if sub[1] == "channels_local_linear_op" else _pointwise(w)
                    _set(tree, blk + ("local_linear", sub[1], "kernel"), conv)
                else:
                    raise KeyError(name)
        else:
            raise KeyError(name)

    init_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(init_params["params"])}
    conv_paths = {jax.tree_util.keystr(p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(tree)}
    assert init_paths == conv_paths, set(init_paths) ^ set(conv_paths)

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ours = np.asarray(model.apply({"params": tree}, jnp.asarray(x)))
    np.testing.assert_allclose(
        ours, ref_out.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )
