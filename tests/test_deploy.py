"""Serving-export round trip (irdu_tpu/deploy.py): serialize the jitted
forward via jax.export, reload it from bytes with no model code, and check
it reproduces the live forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jax.export compiles the tiny flagship (cold-cache minutes)

from irdu_tpu.deploy import export_forward, load_exported
from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter

TINY = dict(dims=(8, 12, 16, 24), hidden_dims=(16, 24, 32, 48),
            nsubnets=(1, 1, 1, 1), ngraphs=(2, 2, 4, 4),
            num_blocks=(1, 1, 1, 1), num_blocks_out=1)


@pytest.fixture(scope="module")
def tiny_model_params():
    model = AbstractMultiScaleGraphFilter(**TINY)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, params


def test_export_roundtrip_matches_live_forward(tiny_model_params, tmp_path):
    model, params = tiny_model_params
    path = str(tmp_path / "fwd.irdu")
    blob = export_forward(model.apply, params, 1, 32, 32,
                          dtype=jnp.float32, path=path)
    assert blob[:5] == b"IRDU1"

    run = load_exported(path)
    assert run.input_shape == (1, 32, 32, 3)

    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    got = np.asarray(run(x))
    want = np.asarray(jax.jit(model.apply)(params, x))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_input_validation(tiny_model_params):
    model, params = tiny_model_params
    with pytest.raises(ValueError, match="/16"):
        export_forward(model.apply, params, 1, 30, 32, dtype=jnp.float32)
    blob = export_forward(model.apply, params, 1, 32, 32, dtype=jnp.float32)
    run = load_exported(blob)
    with pytest.raises(ValueError, match="expected input"):
        run(jnp.zeros((1, 64, 64, 3), jnp.float32))
    with pytest.raises(ValueError, match="not an irdu_tpu export"):
        load_exported(b"GARBAGE-BYTES")
