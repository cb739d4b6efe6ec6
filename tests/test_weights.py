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


def test_npz_int8_pointwise_roundtrip(tmp_path):
    """int8-pointwise snapshots: 2-D kernels stored as int8 + per-output
    scale, dequantized transparently on load (VERDICT r4 #7 — the
    measured-free shipping-size lever)."""
    rng = np.random.RandomState(0)
    params = {
        "head": {"kernel": rng.randn(48, 96).astype(np.float32) * 0.1,
                 "bias": rng.randn(96).astype(np.float32)},
        "dw": {"kernel3": rng.randn(3, 3, 1, 8).astype(np.float32)},
    }
    path = tmp_path / "q.npz"
    save_params_npz(str(path), params, dtype=jnp.bfloat16, int8_pointwise=True)

    back = load_params_npz(str(path), dtype=np.float32)
    # dequantized kernel within per-channel quant error (<= scale/2 per elt)
    w = params["head"]["kernel"]
    err = np.abs(back["head"]["kernel"] - w)
    bound = np.abs(w).max(axis=0, keepdims=True) / 127.0
    assert (err <= bound * 0.51 + 1e-6).all()
    # non-2D kernels untouched by quantization (bf16 round-trip only)
    np.testing.assert_allclose(back["dw"]["kernel3"],
                               params["dw"]["kernel3"], atol=1e-2)

    raw = load_params_npz(str(path), keep_int8=True)
    assert raw["head"]["kernel"]["__q8__"].dtype == np.int8
    assert raw["head"]["kernel"]["__q8scale__"].shape == (1, 96)


def test_export_pointwise_int8_artifact_smaller(tmp_path):
    """deploy.export_forward(pointwise_int8=True): artifact carries int8
    constants (smaller blob) and reproduces the bf16-dequant forward."""
    from irdu_tpu.deploy import export_forward, load_exported
    from flax import linen as nn

    class PointwiseHeavy(nn.Module):
        @nn.compact
        def __call__(self, x):
            b, h, w, c = x.shape
            y = x.reshape(b, h * w, c)
            y = nn.Dense(256, name="d1")(y)
            y = nn.gelu(y)
            y = nn.Dense(256, name="dmid")(y)  # 64k params so weight bytes
            y = nn.Dense(c, name="d2")(y)      # dominate serialization
            return y.reshape(b, h, w, c)

    model = PointwiseHeavy()
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.device_get(jax.jit(model.init)(jax.random.PRNGKey(0), x))

    blob_f = export_forward(model.apply, params, 1, 16, 16,
                            dtype=jnp.float32)
    blob_q = export_forward(model.apply, params, 1, 16, 16,
                            dtype=jnp.float32, pointwise_int8=True)
    assert len(blob_q) < 0.5 * len(blob_f), (len(blob_q), len(blob_f))

    run = load_exported(blob_q)
    xv = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 3), jnp.float32)
    out_q = np.asarray(run(xv))
    out_f = np.asarray(model.apply(params, xv))
    # int8 weight quantization error only
    assert np.max(np.abs(out_q - out_f)) < 0.05
