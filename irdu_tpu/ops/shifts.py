"""The single spatial-shift primitive all graph stencils are built from.

``shift2d(x, dh, dw)`` reads ``x[i+dh, j+dw]`` at every pixel, with either
edge-clamped ("replicate pad") or zero-filled boundary semantics. It is a
pad + static slice, which XLA fuses into neighbouring elementwise work —
there is no materialised gather.
"""

from __future__ import annotations

import jax.numpy as jnp


def shift2d(x: jnp.ndarray, dh: int, dw: int, *, mode: str = "edge",
            h_axis: int = 1, w_axis: int = 2) -> jnp.ndarray:
    """out[..., i, j, ...] = x[..., i+dh, j+dw, ...] with boundary handling.

    mode="edge": out-of-range indices clamp to the border (replicate pad),
    matching torch's ``F.pad(·, "replicate")`` + shifted slice
    (reference v1x0.py:128-144).
    mode="zero": out-of-range reads produce 0 (the scatter semantics of the
    reference's ``op_C_transpose`` in-place updates, v1x0.py:469-513).
    mode="reflect": edge-excluded reflection (torch "reflect" pad — the
    v5–v8 family's stats_conv boundary, model_GLR_GTV_deep_v6.py:456).
    """
    if dh == 0 and dw == 0:
        return x
    ndim = x.ndim
    pad = [(0, 0)] * ndim
    pad[h_axis] = (max(-dh, 0), max(dh, 0))
    pad[w_axis] = (max(-dw, 0), max(dw, 0))
    if mode == "edge":
        xp = jnp.pad(x, pad, mode="edge")
    elif mode == "zero":
        xp = jnp.pad(x, pad, mode="constant")
    elif mode == "reflect":
        xp = jnp.pad(x, pad, mode="reflect")
    else:
        raise ValueError(f"unknown shift mode: {mode}")
    idx = [slice(None)] * ndim
    h = x.shape[h_axis]
    w = x.shape[w_axis]
    idx[h_axis] = slice(max(dh, 0), max(dh, 0) + h)
    idx[w_axis] = slice(max(dw, 0), max(dw, 0) + w)
    return xp[tuple(idx)]
