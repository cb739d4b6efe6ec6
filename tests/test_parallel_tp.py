"""Tensor/expert parallelism (parallel/tensor.py): the dp×tp train step
must produce the same loss and updated params as the single-device step.

The "model" mesh axis shards the gated blocks' hidden dim (Megatron
split) and the solvers' graph hypotheses (expert split); GSPMD only
changes the layout/collective structure, never the math, so everything
matches to reduction-order tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config
from irdu_tpu.parallel.mesh import shard_batch
from irdu_tpu.parallel.tensor import (
    MODEL_AXIS,
    check_tp_divisibility,
    make_dp_tp_mesh,
    param_shardings,
    shard_train_state,
    spec_for_param,
    train_state_shardings,
)
from irdu_tpu.train.steps import create_train_state, make_train_step


def _tiny_model(**kw):
    return AbstractMultiScaleGraphFilter(
        dims=(8, 12, 16, 24), hidden_dims=(16, 24, 32, 48),
        ngraphs=(2, 2, 4, 4), num_blocks=(2, 2, 2, 2), num_blocks_out=2,
        **kw)


def test_spec_rules_cover_flagship_params():
    """Every sharded param dim must be divisible by tp=2, and the rules
    must fire on the expected families (expand/depthwise/project kernels,
    per-graph solver params)."""
    model = _tiny_model()
    check_tp_divisibility(model, tp=2)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    hits = {"expand": 0, "dw": 0, "proj": 0, "graph": 0}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        spec = spec_for_param(path, leaf)
        if MODEL_AXIS not in jax.tree_util.tree_leaves(tuple(spec)):
            continue
        axis = tuple(spec).index(MODEL_AXIS)
        assert leaf.shape[axis] % 2 == 0, (path, leaf.shape, spec)
        names = [str(getattr(k, "key", k)) for k in path]
        if "channels_linear_op" in names:
            hits["expand"] += 1
        elif "channels_local_linear_op" in names:
            hits["dw"] += 1
        elif "project_out" in names:
            hits["proj"] += 1
        else:
            hits["graph"] += 1
    # 8 enc + 6 dec + 2 refine = 16 gated blocks; 4 solvers × ≥8 per-graph
    assert hits["expand"] == hits["dw"] == hits["proj"] == 16
    assert hits["graph"] >= 32


def test_spec_rules_cover_real_flagship_tree():
    """Name-drift tripwire on the REAL 13.28M flagship param tree
    (VERDICT r2 #6): `spec_for_param` keys on exact module names
    (channels_linear_op / channels_local_linear_op / project_out and the
    per-graph solver params) and silently replicates anything it does not
    recognize — so a renamed module would quietly de-shard. This pins the
    exact hit counts via eval_shape (no compile): 44 gated blocks
    (= 2·(4+6+6) enc/dec + 8 latent + 4 out, PERF.md "all 44 blocks") and
    112 per-graph solver leaves (4 scales × 28)."""
    model = AbstractMultiScaleGraphFilter(**flagship_config())
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    hits = {"expand": 0, "dw": 0, "proj": 0, "graph": 0}
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        spec = spec_for_param(path, leaf)
        if MODEL_AXIS not in jax.tree_util.tree_leaves(tuple(spec)):
            continue
        names = [str(getattr(k, "key", k)) for k in path]
        if "channels_linear_op" in names:
            hits["expand"] += 1
        elif "channels_local_linear_op" in names:
            hits["dw"] += 1
        elif "project_out" in names:
            hits["proj"] += 1
        else:
            hits["graph"] += 1
        # every sharded dim divisible by the max supported tp (8)
        axis = tuple(spec).index(MODEL_AXIS)
        assert leaf.shape[axis] % 8 == 0, (names, leaf.shape, spec)
    assert hits == {"expand": 44, "dw": 44, "proj": 44, "graph": 112}, hits


def _tp8_model(**kw):
    """Tiny model whose sharded dims divide tp=8 (2·hidden and ngraphs) —
    and whose dims divide ngraphs (C = G·F model validity)."""
    return AbstractMultiScaleGraphFilter(
        dims=(8, 16, 24, 32), hidden_dims=(16, 24, 32, 48),
        ngraphs=(8, 8, 8, 8), num_blocks=(1, 1, 1, 1), num_blocks_out=1,
        **kw)


@pytest.mark.slow
@pytest.mark.parametrize("tp", [4, 8])
def test_tp4_tp8_loss_matches_single_device(tp):
    """Higher model-axis degrees (VERDICT r2 #6): dp×tp ∈ {2×4, 1×8} over
    the 8 virtual CPU devices, full train step, loss/params match the
    single-device step."""
    model = _tp8_model()
    check_tp_divisibility(model, tp=tp)
    rng = np.random.RandomState(0)
    noisy = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    clean = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    key = jax.random.PRNGKey(3)

    state1 = create_train_state(
        model, jax.random.PRNGKey(0), noisy[:1], schedule=lambda i: 1e-3)
    step1 = make_train_step(model, mesh=None, donate=False)
    state1_out, m1 = step1(state1, noisy, clean, key)

    mesh = make_dp_tp_mesh(jax.devices()[:8], tp=tp)
    state_tp = create_train_state(
        model, jax.random.PRNGKey(0), noisy[:1], schedule=lambda i: 1e-3)
    state_tp = shard_train_state(state_tp, mesh)
    step_tp = make_train_step(
        model, mesh=mesh, donate=False,
        state_shardings=train_state_shardings(state_tp, mesh))
    n_tp, c_tp = shard_batch((noisy, clean), mesh)
    state_tp_out, m_tp = step_tp(state_tp, n_tp, c_tp, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m_tp["loss"]),
                               rtol=1e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(state1_out.params)[0]
    flat_tp = jax.tree_util.tree_leaves(state_tp_out.params)
    for (path, a), b in zip(flat1, flat_tp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_tp_flagship_dims_forward_smoke():
    """Flagship-dims TP smoke (VERDICT r2 #6): the REAL 13.28M param tree
    sharded dp=4×tp=2 over the CPU mesh, one jitted forward at 32² —
    catches GSPMD partitioning failures that tiny dims can mask (uneven
    shard constraints, replicated-rule fallout at 768-wide hiddens)."""
    model = AbstractMultiScaleGraphFilter(**flagship_config())
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    mesh = make_dp_tp_mesh(jax.devices()[:8], tp=2)
    placed = jax.device_put(params, param_shardings(params, mesh))
    xb = shard_batch(x, mesh)
    fwd = jax.jit(model.apply)
    y = np.asarray(fwd(placed, xb))
    assert y.shape == x.shape and np.all(np.isfinite(y))


@pytest.mark.slow  # dp×tp train-step compile on the CPU mesh (~10 min cold)
def test_tp_loss_matches_single_device():
    """dp=4 × tp=2 over the 8 virtual CPU devices: one full train step
    (3-term loss, Adam) bit-comparable with the single-device step."""
    model = _tiny_model()
    rng = np.random.RandomState(0)
    noisy = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    clean = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    key = jax.random.PRNGKey(3)

    state1 = create_train_state(
        model, jax.random.PRNGKey(0), noisy[:1], schedule=lambda i: 1e-3)
    step1 = make_train_step(model, mesh=None, donate=False)
    state1_out, m1 = step1(state1, noisy, clean, key)

    mesh = make_dp_tp_mesh(jax.devices()[:8], tp=2)
    state_tp = create_train_state(
        model, jax.random.PRNGKey(0), noisy[:1], schedule=lambda i: 1e-3)
    state_tp = shard_train_state(state_tp, mesh)
    step_tp = make_train_step(
        model, mesh=mesh, donate=False,
        state_shardings=train_state_shardings(state_tp, mesh))
    n_tp, c_tp = shard_batch((noisy, clean), mesh)
    state_tp_out, m_tp = step_tp(state_tp, n_tp, c_tp, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m_tp["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["psnr"]), float(m_tp["psnr"]),
                               rtol=1e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(state1_out.params)[0]
    flat_tp = jax.tree_util.tree_leaves(state_tp_out.params)
    for (path, a), b in zip(flat1, flat_tp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_tp_param_placement_is_sharded():
    """The sharded params must actually live distributed — addressable
    shard shapes smaller than the global shape on the model axis."""
    model = _tiny_model()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    mesh = make_dp_tp_mesh(jax.devices()[:8], tp=2)
    placed = jax.device_put(params, param_shardings(params, mesh))

    k = placed["params"]["encoder_scale_00_0"]["local_linear"][
        "channels_linear_op"]["kernel"]
    assert k.shape[1] == 2 * k.addressable_shards[0].data.shape[1]
    a = placed["params"]["localfilter_scale_03"]["local_filter"]["alphaCGD"]
    assert a.shape[1] == 2 * a.addressable_shards[0].data.shape[1]
