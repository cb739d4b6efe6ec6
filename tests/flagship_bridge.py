"""Convert a reference AbtractMultiScaleGraphFilter torch state_dict into
irdu_tpu flax params, for full-model parity tests (and, later, for loading
reference-trained checkpoints)."""

from __future__ import annotations

import numpy as np


def _pointwise(w):  # torch (O, I, 1, 1) -> flax (I, O)
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def _conv3x3(w):  # (O, I, 3, 3) -> (3, 3, I, O)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _down2x2(w):  # (O, I, 2, 2) -> (4I, O), flat index (a*2+b)*I + i
    o = w.shape[0]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)).reshape(-1, o))


def _up2x2(w):  # conv_transpose (I, O, 2, 2) -> (I, 4O), flat (a*2+b)*O + o
    i = w.shape[0]
    return np.ascontiguousarray(np.transpose(w, (0, 2, 3, 1)).reshape(i, -1))


def _per_channel(w):  # (C, 1, 1, 1) -> (C,)
    return np.ascontiguousarray(w[:, 0, 0, 0])


def _stats(w, g, f):  # (G*F, 1, 1, 1) -> (G, F)
    return np.ascontiguousarray(w[:, 0, 0, 0].reshape(g, f))


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def torch_to_flax_params(state_dict, *, dims, ngraphs) -> dict:
    """Map every torch parameter to its flax location. dims/ngraphs give the
    per-scale (G, F) factorization of solver channels."""
    tree: dict = {}
    for name, tensor in state_dict.items():
        w = tensor.detach().numpy()
        parts = name.split(".")
        top = parts[0]

        if top == "patch_3x3_embeding":
            _set(tree, ("patch_3x3_embeding", "channels_local_linear_op01", "kernel"), _conv3x3(w))
        elif top.startswith(("encoder_scale_", "decoder_scale_", "refining_block")):
            if top == "refining_block":
                scope = f"refining_block_{parts[1]}"
            else:
                scope = f"{top}_{parts[1]}"
            rest = parts[2:]
            if rest == ["skip_weight"]:
                _set(tree, (scope, "skip_weight"), w)
            elif rest == ["norm", "weighted_transform", "weight"]:
                _set(tree, (scope, "norm", "weighted_transform"), _per_channel(w))
            elif rest[0] == "local_linear":
                sub = rest[1]
                if sub == "channels_local_linear_op":
                    _set(tree, (scope, "local_linear", sub, "kernel"), _conv3x3(w))
                else:
                    _set(tree, (scope, "local_linear", sub, "kernel"), _pointwise(w))
            else:
                raise KeyError(name)
        elif top.startswith("down_sample_"):
            _set(tree, (top, "kernel"), _down2x2(w))
        elif top.startswith("up_sample_"):
            _set(tree, (top, "kernel"), _up2x2(w))
        elif top.startswith("combine_channels_") or top == "linear_output":
            _set(tree, (top, "kernel"), _pointwise(w))
        elif top.startswith("localfilter_scale_"):
            scale = int(top[-2:])
            g = ngraphs[scale]
            f = dims[scale] // g
            rest = parts[1:]
            if rest == ["skip_weight"]:
                _set(tree, (top, "skip_weight"), w)
                continue
            assert rest[0] == "local_filter"
            rest = rest[1:]
            lf = (top, "local_filter")
            if rest[0] in ("alphaCGD", "betaCGD") or rest[0] in (
                "ro00", "ro01", "gamma00", "gamma01", "muys00", "muys01"
            ):
                _set(tree, lf + (rest[0],), w)
            elif rest[0] == "patchs_features_extraction00":
                _set(tree, lf + ("patchs_features_extraction00", "kernel"), _pointwise(w))
            elif rest[0] == "patchs_features_extraction01":
                if rest[1] == "0":
                    _set(tree, lf + ("patchs_features_extraction01_down", "kernel"), _down2x2(w))
                else:
                    _set(tree, lf + ("patchs_features_extraction01_point", "kernel"), _pointwise(w))
            elif rest[0] in ("GTVmodule00", "GTVmodule01", "GLRmodule00", "GLRmodule01"):
                mod, pname = rest[0], rest[1]
                if pname == "multiM":
                    _set(tree, lf + (mod, "multiM"), w)
                elif pname.startswith("stats_kernel_"):
                    _set(tree, lf + (mod, pname.replace("stats_kernel_", "stats_")), _stats(w, g, f))
                else:
                    raise KeyError(name)
            else:
                raise KeyError(name)
        else:
            raise KeyError(name)
    return tree
