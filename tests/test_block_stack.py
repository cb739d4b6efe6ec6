"""Parity tests for the flat-lane stacked gated-block kernel
(ops/pallas/block_stack.py) and the model-level CHW fast path.

Interpret mode on CPU (conftest forces the CPU platform); the jnp NHWC
path is authoritative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irdu_tpu.ops.pallas.block_stack import (
    block_stack_reference,
    fused_block_stack,
    pack_block_params,
    stack_ok,
)


def _mk_params(rng, c, h2, k):
    return [dict(
        scale=rng.randn(c).astype(np.float32) * 0.1 + 1.0,
        w1=(rng.randn(c, h2) / np.sqrt(c)).astype(np.float32),
        dwk=(rng.randn(3, 3, h2) * 0.2).astype(np.float32),
        w2=(rng.randn(h2 // 2, c) / np.sqrt(h2 // 2)).astype(np.float32),
        skip=np.array([1.0, 0.8], np.float32)) for _ in range(k)]


@pytest.mark.parametrize("c,h2,h,w,k", [
    (48, 192, 32, 128, 4),   # stacked: image-boundary rebuild exercised
    (16, 64, 24, 256, 3),
    (48, 192, 16, 128, 1),   # single block
    (8, 32, 8, 128, 2),      # single band (nb == 1)
])
def test_block_stack_matches_reference(c, h2, h, w, k):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, c, h, w) * 0.5, jnp.float32)
    params = _mk_params(rng, c, h2, k)
    assert stack_ok(x.shape, k)
    got = fused_block_stack(x, *pack_block_params(params, jnp.float32),
                            interpret=True)
    want = block_stack_reference(x, params)
    rel = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert rel < 2e-5, rel


def test_block_stack_dw_mxu_path_matches_reference():
    """dw_mxu=True folds the expand into nine MXU tap dots (measured
    slower on-chip — kept as a covered alternative, see PERF.md)."""
    rng = np.random.RandomState(3)
    c, h2, h, w, k = 48, 192, 32, 128, 4
    x = jnp.asarray(rng.randn(1, c, h, w) * 0.5, jnp.float32)
    params = _mk_params(rng, c, h2, k)
    got = fused_block_stack(x, *pack_block_params(params, jnp.float32),
                            dw_mxu=True, interpret=True)
    want = block_stack_reference(x, params)
    rel = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert rel < 2e-5, rel


def test_stack_ok_rejects_narrow_widths():
    assert not stack_ok((1, 48, 64, 64), 2)     # W % 128 != 0
    assert stack_ok((1, 48, 64, 128), 2)


def test_flagship_fast_path_matches_jnp():
    """The CHW fast path (stacked block kernels + CHW glue + CHW solver)
    vs the authoritative NHWC jnp path, on shapes that exercise both the
    stacked/CHW zone (scales 0-1) and the NHWC fallback (scale 2-3)."""
    from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter

    cfg = dict(dims=(16, 24, 32, 48), hidden_dims=(32, 48, 64, 96),
               nsubnets=(1, 1, 1, 1), ngraphs=(2, 2, 4, 4),
               num_blocks=(2, 3, 2, 2), num_blocks_out=2)
    fast = AbstractMultiScaleGraphFilter(
        use_pallas_blocks=True, use_pallas_solver=True, **cfg)
    slow = AbstractMultiScaleGraphFilter(**cfg)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 256, 3),
                    jnp.float32)
    params = fast.init(jax.random.PRNGKey(0), x)
    got = fast.apply(params, x)
    want = slow.apply(params, x)
    rel = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert rel < 5e-5, rel

    got_ed = fast.apply(params, x, method=fast.enc_dec)
    want_ed = slow.apply(params, x, method=slow.enc_dec)
    rel = float(jnp.max(jnp.abs(got_ed - want_ed))) / float(
        jnp.max(jnp.abs(want_ed)))
    assert rel < 5e-5, rel
