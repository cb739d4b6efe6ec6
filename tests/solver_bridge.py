"""Generic torch→flax converter for the ablation solver trees (3-block
nonlinear heads, graph-op params, CG scalars)."""

from __future__ import annotations

import numpy as np

from flagship_bridge import _conv3x3, _down2x2, _per_channel, _pointwise, _set

SCALARS = ("alphaCGD", "betaCGD", "ro00", "ro01", "gamma00", "gamma01",
           "muys00", "muys01")
GRAPH_MODULES = ("GTVmodule00", "GTVmodule01", "GLRmodule00", "GLRmodule01")


def _convert_block(tree, scope, sub, w, name):
    """LocalNonLinearBlock params under `scope`."""
    if sub == ["skip_weight"]:
        _set(tree, scope + ("skip_weight",), np.ascontiguousarray(w))
    elif sub == ["norm", "weighted_transform", "weight"]:
        _set(tree, scope + ("norm", "weighted_transform"), _per_channel(w))
    elif sub[0] == "local_linear":
        conv = _conv3x3(w) if sub[1] == "channels_local_linear_op" else _pointwise(w)
        _set(tree, scope + ("local_linear", sub[1], "kernel"), conv)
    else:
        raise KeyError(name)


def convert_solver_state(state_dict, *, dims=None, ngraphs=None,
                         head_block_count: int = 3) -> dict:
    """Map a reference ablation-solver (GTVGLR/GLR/ MixtureGTVGLR with
    nonlinear heads) state_dict into our flax tree. Handles:
      patchs_features_extraction00/GLR/GTV.{i} sequential entries
      (LocalNonLinearBlocks at indices < head_block_count, the optional
      expand conv after), patchs_features_extraction01 (2×2 down + blocks
      + expand), graph-op params, CG scalars, (G,F)-reshaped stats."""
    tree: dict = {}
    for name, tensor in state_dict.items():
        w = tensor.detach().numpy()
        parts = name.split(".")
        top = parts[0]
        if top in SCALARS:
            _set(tree, (top,), np.ascontiguousarray(w))
        elif top in GRAPH_MODULES:
            pname = parts[1]
            if pname == "multiM":
                _set(tree, (top, "multiM"), np.ascontiguousarray(w))
            elif pname.startswith("stats_kernel_"):
                g, f = w.shape[0], 1
                if ngraphs:
                    g = ngraphs
                    f = w.shape[0] // g
                arr = w[:, 0, 0, 0].reshape(g, f) if w.ndim == 4 else w
                _set(tree, (top, pname.replace("stats_kernel_", "stats_")),
                     np.ascontiguousarray(arr))
            else:
                raise KeyError(name)
        elif top.startswith("patchs_features_extraction"):
            scope_name = top
            idx = int(parts[1])
            rest = parts[2:]
            if top == "patchs_features_extraction01":
                # 2×2 down conv at index 0 (two_scale_nl head), then blocks
                if idx == 0 and rest == ["weight"]:
                    _set(tree, ("patchs_features_extraction01_down", "kernel"),
                         _down2x2(w))
                elif rest == ["weight"]:
                    _set(tree, ("patchs_features_extraction01_head", "expand", "kernel"),
                         _pointwise(w))
                else:
                    _convert_block(
                        tree, ("patchs_features_extraction01_head", f"block_{idx - 1}"),
                        rest, w, name)
            else:
                if idx >= head_block_count and rest == ["weight"]:
                    _set(tree, (scope_name, "expand", "kernel"), _pointwise(w))
                else:
                    _convert_block(tree, (scope_name, f"block_{idx}"), rest, w, name)
        else:
            raise KeyError(name)
    return tree
