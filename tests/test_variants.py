"""v20 (non-expansive conv) / v21 (spectral norm) variants: smoke +
semantics checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter
from irdu_tpu.models.layers import GroupedPointwise

TINY = dict(dims=(8, 12, 16, 24), hidden_dims=(16, 24, 32, 48),
            ngraphs=(2, 2, 4, 4), num_blocks=(1, 1, 1, 1), num_blocks_out=1)


@pytest.mark.parametrize("variant", ["non_expansive", "spectral_norm"])
def test_variant_flagship_forward(rng, variant):
    model = AbstractMultiScaleGraphFilter(conv_variant=variant, **TINY)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    if variant == "spectral_norm":
        y, _ = model.apply(variables, x, mutable=["spectral"])
    else:
        y = model.apply(variables, x)
    assert y.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_spectral_norm_bounds_gain(rng):
    """After power-iteration convergence the effective kernel has top
    singular value ≈ 1."""
    layer = GroupedPointwise(features=6, variant="spectral_norm")
    x = jnp.asarray(rng.randn(1, 4, 4, 6).astype(np.float32) * 10)
    variables = layer.init(jax.random.PRNGKey(3), x)
    # converge u by repeated mutable application
    for _ in range(50):
        _, updates = layer.apply(variables, x, mutable=["spectral"])
        variables = {**variables, "spectral": updates["spectral"]}
    kernel = np.asarray(variables["params"]["kernel"])
    u = np.asarray(variables["spectral"]["kernel_u"])
    mat = kernel.T  # (O, I)
    v = mat.T @ u
    v /= np.linalg.norm(v)
    sigma = float(u @ (mat @ v))
    true_sigma = np.linalg.svd(mat, compute_uv=False)[0]
    assert abs(sigma - true_sigma) / true_sigma < 1e-3
    # normalized kernel top singular value == 1
    assert abs(np.linalg.svd(mat / sigma, compute_uv=False)[0] - 1.0) < 1e-3


def test_non_expansive_scale_bounds_output(rng):
    """v20 gain bound: |out| ≤ Σ|W|·|x|_max · tanh(1/(Σ|W|·s)) — for large
    weights the tanh kills the gain; with unit scaling the layer cannot
    amplify a constant input beyond tanh(1/Σ|W|)·Σ|W| < 1 per channel."""
    layer = GroupedPointwise(features=4, variant="non_expansive")
    x = jnp.ones((1, 8, 8, 4))
    variables = layer.init(jax.random.PRNGKey(0), x)
    # inflate weights 100×: plain conv output would explode, bounded stays <1
    big = {"params": {
        "kernel": variables["params"]["kernel"] * 100.0,
        "scaling_factor": variables["params"]["scaling_factor"],
    }}
    y = layer.apply(big, x)
    assert float(jnp.max(jnp.abs(y))) <= 1.0 + 1e-5
