"""utils/weights.py: npz snapshot round-trip (incl. bf16 leaf encoding)."""

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.utils.weights import load_params_npz, save_params_npz


def test_npz_roundtrip(tmp_path):
    params = {
        "block": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4),
                  "bias": np.zeros(4, np.float32)},
        "scale": np.ones((2, 1), np.float32),
    }
    path = tmp_path / "w.npz"

    save_params_npz(str(path), params)
    back = load_params_npz(str(path))
    assert set(back) == {"block", "scale"}
    np.testing.assert_array_equal(back["block"]["kernel"],
                                  params["block"]["kernel"])

    # bf16 snapshot + f32 load-cast
    save_params_npz(str(path), params, dtype=jnp.bfloat16)
    back = load_params_npz(str(path), dtype=np.float32)
    assert back["block"]["bias"].dtype == np.float32
    np.testing.assert_allclose(back["block"]["kernel"],
                               params["block"]["kernel"], rtol=1e-2)


def test_npz_roundtrip_model_params(tmp_path):
    from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter

    model = AbstractMultiScaleGraphFilter(
        dims=(4, 6, 8, 12), hidden_dims=(8, 12, 16, 24),
        ngraphs=(2, 2, 2, 2), num_blocks=(1, 1, 1, 1), num_blocks_out=1)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    path = tmp_path / "m.npz"
    save_params_npz(str(path), jax.device_get(params))
    back = load_params_npz(str(path))

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    y_a = model.apply(params, x)
    y_b = model.apply(back, x)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b), atol=1e-6)
