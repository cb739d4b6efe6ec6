"""Convert a reference v6 MixtureGTV torch state_dict into irdu_tpu flax
params (pixel-domain family parity)."""

from __future__ import annotations

import re

import numpy as np

from flagship_bridge import _conv3x3, _per_channel, _pointwise, _set


def torch_to_flax_pixel(state_dict) -> dict:
    tree: dict = {}
    for name, tensor in state_dict.items():
        w = tensor.detach().numpy()
        # name normalisation to our flax scopes
        n = name
        n = re.sub(r"\.(\d+)\.(?=norm|skip|ffn)", r"_\1/", n)  # seq FFBlock idx
        n = n.replace(".body.0.weight", "/body_conv/weight")
        n = n.replace("combination_weight.0.weight", "combination_weight/weight")
        n = re.sub(r"stats_kernel_(p\w+)", r"stats_\1", n)
        n = n.replace(".", "/")
        parts = n.split("/")

        if parts[-1] == "weight":
            parts = parts[:-1]
            if parts[-1] == "weighted_transform":
                _set(tree, tuple(parts), _per_channel(w))
            elif w.ndim == 4 and w.shape[2:] == (3, 3):
                _set(tree, tuple(parts + ["kernel"]), _conv3x3(w))
            elif w.ndim == 4 and w.shape[2:] == (1, 1):
                _set(tree, tuple(parts + ["kernel"]), _pointwise(w))
            else:
                raise KeyError(name)
        else:
            _set(tree, tuple(parts), np.ascontiguousarray(w))
    return tree
