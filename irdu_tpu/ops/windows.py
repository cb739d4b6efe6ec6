"""Graph connection windows and their edge-offset tables.

A connection window is a (2r+1)×(2r+1) 0/1 mask centred on a pixel; each
1-entry defines a directed edge from the pixel to the neighbour at that
offset. Edge order is row-major over the window, matching the reference
construction (itertools.product over ``arange(k)-k//2``; see
/root/reference/exploration/GGTV_GGLR_v1.0/deep_multiscale_GGLR_GGTV_v1x0.py:41-53).
"""

from __future__ import annotations

import itertools

import numpy as np

# 4-neighbour cross (the flagship v13/v1x0 window).
WINDOW_CROSS4 = np.array(
    [
        [0, 1, 0],
        [1, 0, 1],
        [0, 1, 0],
    ],
    dtype=np.int32,
)

# 12-neighbour 5×5 diamond (the v5–v8 pixel-domain family window).
WINDOW_DIAMOND12 = np.array(
    [
        [0, 0, 1, 0, 0],
        [0, 1, 1, 1, 0],
        [1, 1, 0, 1, 1],
        [0, 1, 1, 1, 0],
        [0, 0, 1, 0, 0],
    ],
    dtype=np.int32,
)

# 8-neighbour full 3×3 ring (v0/v1-era arbitrary-window core).
WINDOW_RING8 = np.array(
    [
        [1, 1, 1],
        [1, 0, 1],
        [1, 1, 1],
    ],
    dtype=np.int32,
)


def window_to_deltas(window: np.ndarray) -> tuple[tuple[int, int], ...]:
    """Row-major (dh, dw) offsets of the 1-entries of a centred window."""
    k = window.shape[0]
    m = np.arange(k) - k // 2
    flat = window.reshape(-1)
    deltas = np.array(list(itertools.product(m, m)), dtype=np.int32)[flat == 1]
    return tuple((int(dh), int(dw)) for dh, dw in deltas)


EDGE_DELTAS_CROSS4 = window_to_deltas(WINDOW_CROSS4)       # ((-1,0),(0,-1),(0,1),(1,0))
EDGE_DELTAS_DIAMOND12 = window_to_deltas(WINDOW_DIAMOND12)
EDGE_DELTAS_RING8 = window_to_deltas(WINDOW_RING8)

WINDOWS = {
    "cross4": EDGE_DELTAS_CROSS4,
    "diamond12": EDGE_DELTAS_DIAMOND12,
    "ring8": EDGE_DELTAS_RING8,
}
