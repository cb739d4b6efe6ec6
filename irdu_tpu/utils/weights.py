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


def quantize_kernel_int8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8 for a 2-D (1×1-conv) kernel.
    Measured FREE in quality on the 51k flagship (PERF.md round-4
    deployment levers: 44.911 int8-weights vs 44.743 bf16 on the 512²
    protocol) at ~4× smaller payload — the int8 lever that survives."""
    w = np.asarray(w, np.float32)
    scale = np.abs(w).max(axis=0, keepdims=True) / 127.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_pointwise_int8(params):
    """Quantize every 2-D ``kernel`` leaf to {__q8__, __q8scale__} marker
    dicts (all other leaves pass through). The inverse is
    ``dequantize_pointwise`` — both are pure-numpy tree walks."""
    def walk(node, name=""):
        if isinstance(node, Mapping):
            return {k: walk(v, k) for k, v in node.items()}
        arr = np.asarray(node)
        if name == "kernel" and arr.ndim == 2:
            q, s = quantize_kernel_int8(arr)
            return {"__q8__": q, "__q8scale__": s}
        return arr

    return walk(params)


def dequantize_pointwise(tree, dtype=None, asarray=np.asarray):
    """Collapse {__q8__, __q8scale__} markers back to dense kernels.
    ``asarray=jnp.asarray`` inside a trace bakes int8 constants + a
    dequant multiply into the program (deploy's --weight-int8 path)."""
    def walk(node):
        if isinstance(node, Mapping):
            if "__q8__" in node:
                q = asarray(node["__q8__"])
                s = asarray(node["__q8scale__"])
                w = q.astype(s.dtype) * s
                return w.astype(dtype) if dtype is not None else w
            return {k: walk(v) for k, v in node.items()}
        arr = asarray(node)
        return arr.astype(dtype) if dtype is not None else arr

    return walk(tree)


def save_params_npz(path: str, params, dtype=None,
                    int8_pointwise: bool = False) -> None:
    """Write a params pytree to ``path``. ``dtype`` (e.g. jnp.bfloat16)
    optionally casts every leaf — bf16 halves the artifact and matches the
    inference fast path; keep None to snapshot training-precision f32.
    ``int8_pointwise`` additionally stores every 2-D (1×1) kernel as
    symmetric per-output-channel int8 + f32 scale (~4× smaller snapshots,
    measured quality-free — PERF.md round-4); ``load_params_npz``
    dequantizes transparently."""
    if int8_pointwise:
        params = quantize_pointwise_int8(params)
    flat = {}
    for key, arr in _flatten(params):
        if dtype is not None and not key.rpartition("/")[2].startswith("__q8"):
            arr = arr.astype(dtype)
        # numpy can't natively serialize ml_dtypes.bfloat16 → store the
        # raw uint16 view plus a marker suffix
        if arr.dtype.name == "bfloat16":
            flat[key + "::bf16"] = arr.view(np.uint16)
        else:
            flat[key] = arr
    np.savez_compressed(path, **flat)


def load_params_npz(path: str, dtype=None, keep_int8: bool = False):
    """Rebuild the nested params dict. ``dtype`` optionally casts every
    leaf on load (e.g. jnp.bfloat16 for the fast path, jnp.float32 to
    fine-tune). int8-pointwise snapshots are dequantized transparently
    unless ``keep_int8`` (deploy bakes the int8 + scales into the export
    so the artifact itself stays ~4× smaller)."""
    import ml_dtypes

    out: dict = {}
    has_q8 = False
    with np.load(path) as data:
        for key in data.files:
            arr = data[key]
            if key.endswith("::bf16"):
                key = key[: -len("::bf16")]
                arr = arr.view(ml_dtypes.bfloat16)
            is_q8 = key.rpartition("/")[2].startswith("__q8")
            has_q8 = has_q8 or is_q8
            if dtype is not None and not is_q8:
                arr = arr.astype(dtype)
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    if has_q8 and not keep_int8:
        out = dequantize_pointwise(out, dtype=dtype)
    return out
