"""Spatial tiling — the image-domain analogue of context parallelism.

The graph operators are strictly local (≤2-pixel stencils) but the
flagship U-Net's 3 downsamples + the solver's internal 2× give a /16
structure and a finite receptive field, so a full-resolution image can be
processed as overlapping tiles whose halos cover the receptive field,
then cropped and stitched — bit-close to whole-image inference while
bounding memory (the reference instead runs whole images through one GPU,
scripts_v2/...sigma25.py:267-271).

Two drivers:
  * `tiled_forward` — sequential tiles on one device (memory bound).
  * `sharded_tiled_forward` — tiles sharded over a device mesh via
    jax.vmap+shard_map-style batching (throughput bound): the TPU-native
    way to fan a 4K image across a slice.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _tile_grid(size: int, tile: int, halo: int) -> list[tuple[int, int, int, int]]:
    """(core_start, core_end, read_start, read_end) per tile, core tiles
    partition [0, size)."""
    spans = []
    n = math.ceil(size / tile)
    for i in range(n):
        c0, c1 = i * tile, min((i + 1) * tile, size)
        r0, r1 = max(c0 - halo, 0), min(c1 + halo, size)
        spans.append((c0, c1, r0, r1))
    return spans


def tiled_forward(
    forward: Callable[[np.ndarray], np.ndarray],
    image: np.ndarray,
    *,
    tile: int = 256,
    halo: int = 64,
    multiple: int = 16,
) -> np.ndarray:
    """Run `forward` ((1,h,w,C)→(1,h,w,C)) over overlapping tiles of a
    single HWC image; halo must cover the model's receptive field for
    exactness (64 px covers the flagship's /16 structure comfortably)."""
    h, w = image.shape[:2]
    out = np.zeros_like(image, dtype=np.float32)
    for hc0, hc1, hr0, hr1 in _tile_grid(h, tile, halo):
        for wc0, wc1, wr0, wr1 in _tile_grid(w, tile, halo):
            patch = image[hr0:hr1, wr0:wr1]
            ph, pw = patch.shape[:2]
            pad_h = (multiple - ph % multiple) % multiple
            pad_w = (multiple - pw % multiple) % multiple
            if pad_h or pad_w:
                patch = np.pad(patch, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            res = np.asarray(forward(patch[None]))[0][:ph, :pw]
            out[hc0:hc1, wc0:wc1] = res[hc0 - hr0: hc0 - hr0 + (hc1 - hc0),
                                        wc0 - wr0: wc0 - wr0 + (wc1 - wc0)]
    return out


def sharded_tiled_forward(
    apply_fn: Callable,
    params,
    image: np.ndarray,
    mesh,
    *,
    tile: int = 256,
    halo: int = 32,
) -> np.ndarray:
    """Batch all (equal-sized) halo'd tiles and evaluate them as one
    batch sharded over the mesh's 'data' axis: tiles ride different chips,
    XLA inserts no cross-chip traffic (tiles are independent; the halo
    replaces ppermute-style boundary exchange)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    h, w = image.shape[:2]
    step = tile
    padded = np.pad(
        image, ((halo, halo + (-h) % step), (halo, halo + (-w) % step), (0, 0)),
        mode="reflect",
    )
    tiles, coords = [], []
    for i in range(math.ceil(h / step)):
        for j in range(math.ceil(w / step)):
            r0, c0 = i * step, j * step
            tiles.append(padded[r0:r0 + tile + 2 * halo, c0:c0 + tile + 2 * halo])
            coords.append((i * step, j * step))
    n_dev = mesh.devices.size
    n_pad = (-len(tiles)) % n_dev
    tiles.extend([np.zeros_like(tiles[0])] * n_pad)
    batch = jnp.asarray(np.stack(tiles))
    batch = jax.device_put(batch, NamedSharding(mesh, P("data")))
    outs = np.asarray(jax.jit(apply_fn)(params, batch))

    result = np.zeros_like(image, dtype=np.float32)
    for (r0, c0), o in zip(coords, outs):
        core = o[halo:halo + step, halo:halo + step]
        r1, c1 = min(r0 + step, h), min(c0 + step, w)
        result[r0:r1, c0:c1] = core[: r1 - r0, : c1 - c0]
    return result
