"""Flagship model: smoke, parameter-count, and full-forward parity tests."""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config

TINY = dict(
    n_channels_in=3,
    n_channels_out=3,
    dims=(8, 12, 16, 24),
    hidden_dims=(16, 24, 32, 48),
    nsubnets=(1, 1, 1, 1),
    ngraphs=(2, 2, 4, 4),
    num_blocks=(1, 1, 1, 1),
    num_blocks_out=1,
)


def _param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def test_tiny_forward_shapes(rng):
    model = AbstractMultiScaleGraphFilter(**TINY)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(y)))

    codes = model.apply(params, x, method=model.encode)
    assert [c.shape for c in codes] == [
        (1, 32, 32, 8), (1, 16, 16, 12), (1, 8, 8, 16), (1, 4, 4, 24)]
    recon = model.apply(params, codes, method=model.decode)
    assert recon.shape == (1, 32, 32, 3)
    full = model.apply(params, x, method=model.enc_dec)
    np.testing.assert_allclose(np.asarray(full), np.asarray(recon), atol=1e-6)


def test_flagship_param_count():
    """Reference LGU has 13,278,816 parameters (SURVEY.md §6, verified by
    instantiating the torch model)."""
    model = AbstractMultiScaleGraphFilter(**flagship_config())
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    assert _param_count(params["params"]) == 13_278_816


@requires_reference
def test_full_model_parity(rng):
    """Forward, encode, decode of the flax flagship match the torch reference
    bit-for-bit (float32 tolerance) under a converted state_dict."""
    import torch
    from flagship_bridge import torch_to_flax_params
    from torch_bridge import load_v1x0

    ref = load_v1x0()
    torch.manual_seed(0)
    tm = ref.AbtractMultiScaleGraphFilter(
        n_channels_in=3,
        n_channels_out=3,
        dims=list(TINY["dims"]),
        hidden_dims=list(TINY["hidden_dims"]),
        nsubnets=list(TINY["nsubnets"]),
        ngraphs=list(TINY["ngraphs"]),
        num_blocks=list(TINY["num_blocks"]),
        num_blocks_out=TINY["num_blocks_out"],
    )
    tm.eval()

    model = AbstractMultiScaleGraphFilter(**TINY)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    init_params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = torch_to_flax_params(
        tm.state_dict(), dims=TINY["dims"], ngraphs=TINY["ngraphs"]
    )

    # structural identity: converted tree covers exactly the init tree
    init_flat = jax.tree_util.tree_leaves_with_path(init_params["params"])
    conv_flat = jax.tree_util.tree_leaves_with_path(converted)
    init_paths = {jax.tree_util.keystr(p): l.shape for p, l in init_flat}
    conv_paths = {jax.tree_util.keystr(p): l.shape for p, l in conv_flat}
    assert init_paths == conv_paths

    params = {"params": converted}

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ref_out = tm(xt).numpy().transpose(0, 2, 3, 1)
        ref_codes = tm.encode(xt)
        ref_recon = tm.decode(ref_codes).numpy().transpose(0, 2, 3, 1)

    ours = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)

    codes = model.apply(params, jnp.asarray(x), method=model.encode)
    for c, rc in zip(codes, ref_codes):
        np.testing.assert_allclose(
            np.asarray(c), rc.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
        )
    recon = np.asarray(model.apply(params, codes, method=model.decode))
    np.testing.assert_allclose(recon, ref_recon, atol=2e-4, rtol=1e-3)
