"""Compact, dependency-free weight snapshots.

Orbax checkpoints (train/checkpoints.py) are the training-resume format,
but they are directory trees tied to the experiment layout — awkward to
version-control or hand to an eval script. This module flattens a flax
params pytree into a single ``.npz`` keyed by ``/``-joined tree paths, so
a trained model can be committed to the repo (bf16 flagship ≈ 26 MB) and
reloaded anywhere with numpy alone.

The reference ships trained weights as ``torch.save`` state_dicts
(e.g. checkpoints_epoch00_iter0795k.pt, GGTV_GGLR_v1.0/README.ipynb
cell 3); this is the TPU build's equivalent portable artifact.
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np


def _flatten(tree, prefix=""):
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}/")
    else:
        yield prefix[:-1], np.asarray(tree)


def save_params_npz(path: str, params, dtype=None) -> None:
    """Write a params pytree to ``path``. ``dtype`` (e.g. jnp.bfloat16)
    optionally casts every leaf — bf16 halves the artifact and matches the
    inference fast path; keep None to snapshot training-precision f32."""
    flat = {}
    for key, arr in _flatten(params):
        if dtype is not None:
            arr = arr.astype(dtype)
        # numpy can't natively serialize ml_dtypes.bfloat16 → store the
        # raw uint16 view plus a marker suffix
        if arr.dtype.name == "bfloat16":
            flat[key + "::bf16"] = arr.view(np.uint16)
        else:
            flat[key] = arr
    np.savez_compressed(path, **flat)


def load_params_npz(path: str, dtype=None):
    """Rebuild the nested params dict. ``dtype`` optionally casts every
    leaf on load (e.g. jnp.bfloat16 for the fast path, jnp.float32 to
    fine-tune)."""
    import ml_dtypes

    out: dict = {}
    with np.load(path) as data:
        for key in data.files:
            arr = data[key]
            if key.endswith("::bf16"):
                key = key[: -len("::bf16")]
                arr = arr.view(ml_dtypes.bfloat16)
            if dtype is not None:
                arr = arr.astype(dtype)
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return out
