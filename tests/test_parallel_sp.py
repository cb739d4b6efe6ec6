"""Spatial parallelism (halo_shard_forward): one image's rows sharded over
the 8-device mesh with ppermute halo exchange must reproduce whole-image
inference — the image analogue of context parallelism (SURVEY.md §5; the
reference instead runs whole images through one GPU,
scripts_v2/...sigma25.py:267-271)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 8-device-mesh jit compiles (multi-minute cold)

import jax
import jax.numpy as jnp

from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter
from irdu_tpu.parallel.mesh import make_mesh
from irdu_tpu.parallel.spatial import halo_shard_forward

TINY = dict(
    n_channels_in=3, n_channels_out=3,
    dims=(8, 12, 16, 24), hidden_dims=(16, 24, 32, 48),
    nsubnets=(1, 1, 1, 1), ngraphs=(2, 2, 4, 4),
    num_blocks=(1, 1, 1, 1), num_blocks_out=1,
)


def _tiny_model_and_params(rng, h, w):
    model = AbstractMultiScaleGraphFilter(**TINY)
    x = rng.rand(h, w, 3).astype(np.float32)
    init_x = jnp.zeros((1, 64, 64, 3), jnp.float32)  # params are shape-free
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_x)
    return model, params, x


def test_halo_shard_matches_whole_image(rng):
    assert len(jax.devices()) >= 8
    model, params, x = _tiny_model_and_params(rng, 256, 48)
    mesh = make_mesh(jax.devices()[:8])

    whole = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x[None])))[0]
    sharded = halo_shard_forward(model.apply, params, x, mesh, halo=16)

    assert sharded.shape == whole.shape
    # 16-row halo covers the tiny model's effective receptive field; the
    # boundary devices see the true image edge (shifted windows), so the
    # tolerance matches the tiled-inference test's
    np.testing.assert_allclose(sharded, whole, atol=5e-3)


def test_halo_shard_uneven_image(rng):
    """H and W not multiples of 16·n: reflect-pad + crop must round-trip."""
    model, params, x = _tiny_model_and_params(rng, 250, 41)
    mesh = make_mesh(jax.devices()[:4])

    # whole-image path pads to /16 exactly like the benchmark protocol
    ph, pw = (-250) % 16, (-41) % 16
    xp = np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    whole = np.asarray(
        jax.jit(model.apply)(params, jnp.asarray(xp[None])))[0, :250, :41]

    sharded = halo_shard_forward(model.apply, params, x, mesh, halo=16)
    assert sharded.shape == x.shape
    # interior rows must agree; global-padding rows differ only through
    # receptive-field decay of the different (reflect vs shard) bottom pad
    np.testing.assert_allclose(sharded[:192], whole[:192], atol=5e-3)
    assert np.isfinite(sharded).all()


def test_halo_shard_single_device(rng):
    model, params, x = _tiny_model_and_params(rng, 64, 48)
    mesh = make_mesh(jax.devices()[:1])
    one = halo_shard_forward(model.apply, params, x, mesh, halo=16)
    whole = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x[None])))[0]
    np.testing.assert_allclose(one, whole, atol=1e-5)
