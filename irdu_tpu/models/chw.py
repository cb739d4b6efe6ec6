"""CHW-layout functional twins of the model glue ops.

The inference fast path carries activations as (B, C, H, W) — the layout
the fused Pallas kernels want (space on lanes; see ops/pallas/block_stack
and ops/pallas/solver_chw) — so the whole encoder/filter/decoder pipeline
runs without per-block transposes. These helpers apply the SAME flax
parameters as the NHWC modules in irdu_tpu/models/layers.py (weight
layouts documented there; reference semantics cited there), just on the
transposed activation layout. All are plain jnp — XLA fuses them between
kernel calls.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_chw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def from_chw(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def pointwise_chw(x, kernel):
    """GroupedPointwise (groups=1): kernel (C_in, C_out)."""
    return jnp.einsum("io,bihw->bohw", kernel, x)


def space_to_depth_chw(x):
    """(B, C, H, W) → (B, 4C, H/2, W/2) with flat channel (a·2+b)·C + c —
    the SAME order as layers.space_to_depth so Downsample2x2 weights apply
    unchanged."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 3, 5, 1, 2, 4)              # (B, a, b, C, h, w)
    return x.reshape(b, 4 * c, h // 2, w // 2)


def depth_to_space_chw(x):
    """(B, 4C, H, W) → (B, C, 2H, 2W), inverse block order."""
    b, c4, h, w = x.shape
    c = c4 // 4
    x = x.reshape(b, 2, 2, c, h, w)
    x = x.transpose(0, 3, 4, 1, 5, 2)              # (B, C, h, a, w, b)
    return x.reshape(b, c, 2 * h, 2 * w)


def downsample2x2_chw(x, kernel):
    """layers.Downsample2x2 (groups=1): kernel (4·C_in, F)."""
    return pointwise_chw(space_to_depth_chw(x), kernel)


def upsample2x2_chw(x, kernel):
    """layers.Upsample2x2 (groups=1): kernel (C_in, 4·F), block order
    (a, b, oc)."""
    return depth_to_space_chw(pointwise_chw(x, kernel))
