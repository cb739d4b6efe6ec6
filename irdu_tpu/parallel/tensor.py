"""Tensor / expert parallelism for the flagship family (GSPMD).

The reference has no model parallelism at all (its DDP plan is
batch-only — SURVEY.md §2.9); on TPU pods the natural second mesh axis
for this architecture is:

  * **tp** over the gated blocks' hidden dimension: each
    LocalGatedLinearBlock is exactly a gated MLP (1×1 expand → 3×3
    depthwise → gate → 1×1 project; reference
    deep_multiscale_GGLR_GGTV_v1x0.py:929-948), so the Megatron split
    applies verbatim — expand kernel column-sharded, depthwise + gate
    channel-local, project kernel row-sharded. One all-reduce per block
    (XLA inserts it over the ICI ring), everything else device-local.
  * **ep** over the solver's graph hypotheses: the unrolled
    GGTV+GGLR solve is *independent per graph* given the features — the
    per-graph edge weights, stats stencils and CG/ADMM iterates never
    mix graphs (ops/graph.py operates blockwise on C = G·F channels).
    Sharding every per-graph solver parameter (alphaCGD/betaCGD/ro/
    gamma/muys/multiM/stats_*) over the same mesh axis makes the entire
    filtering stage collective-free: each device solves its graph
    hypotheses, exactly like experts in an MoE layer.

Pipeline parallelism is deliberately NOT offered: the model is 13.28 M
params (fits any single chip with room to spare) and its compute graph
is a U-Net whose skip connections would force bubble-heavy schedules;
dp×tp×sp covers every scaling regime this family reaches.

Everything here is plain GSPMD: the rules below place the *parameters*;
`jax.jit` with these shardings lets the partitioner propagate layouts
through the computation and insert the collectives. No model code
changes, no shard_map — the same flax modules run 1-device or N-device.

Axis names: "data" (batch) and "model" (tp/ep), mesh built by
`make_dp_tp_mesh`. The "model" axis size must divide every gated
hidden dim (2·hidden_dims[s]) and every graph count (ngraphs[s]) —
asserted in `check_tp_divisibility`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# parameter names created per graph hypothesis by the solvers
# (solvers/gtv_glr.py setup, solvers/common.GraphOpParams)
_PER_GRAPH_1D = frozenset(
    {"ro00", "ro01", "gamma00", "gamma01", "muys00", "muys01",
     # pixel-family MixtureGTV names (solvers/pixel_gtv.py)
     "ro", "gamma", "muy"}
)
_PER_GRAPH_ITER = frozenset({"alphaCGD", "betaCGD"})


def make_dp_tp_mesh(devices=None, tp: int = 1) -> Mesh:
    """2-D ("data", "model") mesh: ICI-adjacent devices share the model
    axis (the per-block all-reduce rides the fastest links)."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < tp or len(devices) % tp != 0:
        raise ValueError(
            f"tensor_parallel={tp} needs a device count divisible by {tp}; "
            f"got {len(devices)} ({[d.platform for d in devices]}). On a "
            f"single host, force a virtual mesh with --platform cpu "
            f"--virtual-devices N (or the conftest JAX_PLATFORMS recipe).")
    arr = np.array(devices).reshape(len(devices) // tp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def check_tp_divisibility(model, tp: int) -> None:
    """The "model" axis must divide the sharded dims (GSPMD wants even
    shards): gated hidden (2·hidden), graph counts, CG iter tables."""
    for hd in model.hidden_dims:
        assert (2 * hd) % tp == 0, f"2*hidden_dim {2*hd} % tp {tp}"
    for g in model.ngraphs:
        assert g % tp == 0, f"ngraphs {g} % tp {tp}"


def _path_names(path) -> list:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:  # pragma: no cover - future key kinds
            out.append(str(k))
    return out


def spec_for_param(path, leaf) -> P:
    """PartitionSpec for one parameter leaf, by its (trailing) tree path.

    The same rules cover params AND optimizer moments: adam's mu/nu
    mirror the param tree, so the trailing names match identically.
    Anything unrecognized is replicated — correctness never depends on a
    rule firing.
    """
    names = _path_names(path)
    if not names:
        return P()
    last = names[-1]
    parent = names[-2] if len(names) > 1 else ""
    ndim = getattr(leaf, "ndim", 0)

    if last == "kernel":
        # Megatron split of the gated block (models/blocks.py):
        if parent == "channels_linear_op" and ndim == 2:
            return P(None, MODEL_AXIS)            # 1×1 expand: column
        if parent == "channels_local_linear_op" and ndim == 4:
            return P(None, None, None, MODEL_AXIS)  # depthwise: channel
        if parent == "project_out" and ndim == 2:
            return P(MODEL_AXIS, None)            # 1×1 project: row
        return P()
    # expert split of the solver's per-graph parameters
    if last in _PER_GRAPH_ITER and ndim == 2:
        return P(None, MODEL_AXIS)                # (n_iters, G)
    if last in _PER_GRAPH_1D and ndim == 1:
        return P(MODEL_AXIS)                      # (G,)
    if (last == "multiM" or last.startswith("stats_")) and ndim == 2:
        return P(MODEL_AXIS, None)                # (G, F) per-channel stats
    return P()


def train_state_shardings(state, mesh: Mesh):
    """A TrainState-shaped pytree of NamedShardings: params and the
    param-shaped optimizer moments get `spec_for_param`, every other
    leaf (step counter, schedule count, ...) is replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for_param(path, leaf)),
        state,
    )


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for_param(path, leaf)),
        params,
    )


def shard_train_state(state, mesh: Mesh):
    """Place a (host or single-device) TrainState onto the dp×tp mesh."""
    return jax.device_put(state, train_state_shardings(state, mesh))
