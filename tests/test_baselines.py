"""Baseline models: smoke tests (shape/finiteness) on tiny configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irdu_tpu.baselines.drunet import DnCNN, FDnCNN, IRCNN, UNetRes
from irdu_tpu.baselines.restormer import Restormer
from irdu_tpu.baselines.swinir import SwinIR


def test_restormer_tiny(rng):
    model = Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                      heads=(1, 1, 2, 2), norm_type="BiasFree")
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_dncnn_family(rng):
    x = jnp.asarray(rng.rand(1, 24, 24, 1).astype(np.float32))
    for model in (DnCNN(nb=5, nc=8, act_mode="R"),
                  IRCNN(nc=8),
                  FDnCNN(in_nc=1, nb=4, nc=8)):
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (1, 24, 24, 1)
        assert np.all(np.isfinite(np.asarray(y)))


def test_dncnn_bn_mode(rng):
    model = DnCNN(nb=4, nc=8, act_mode="BR")
    x = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 16, 16, 1)


def test_unetres_tiny(rng):
    model = UNetRes(in_nc=1, out_nc=1, nc=(8, 16, 32, 64), nb=1)
    x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 32, 32, 1)


def test_swinir_tiny(rng):
    model = SwinIR(embed_dim=16, depths=(2, 2), num_heads=(2, 2), window_size=8)
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(y)))
