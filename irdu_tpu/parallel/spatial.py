"""Spatial tiling — the image-domain analogue of context parallelism.

The graph operators are strictly local (≤2-pixel stencils) but the
flagship U-Net's 3 downsamples + the solver's internal 2× give a /16
structure and a finite receptive field, so a full-resolution image can be
processed as overlapping tiles whose halos cover the receptive field,
then cropped and stitched — bit-close to whole-image inference while
bounding memory (the reference instead runs whole images through one GPU,
scripts_v2/...sigma25.py:267-271).

Three drivers:
  * `tiled_forward` — sequential tiles on one device (memory bound).
  * `sharded_tiled_forward` — tiles sharded over a device mesh via
    jax.vmap+shard_map-style batching (throughput bound): the TPU-native
    way to fan a 4K image across a slice.
  * `halo_shard_forward` — true spatial parallelism (the image analogue of
    sequence/context parallelism): the H axis is sharded over the mesh,
    halo rows ride ICI via `lax.ppermute`, each device runs the full model
    on its shifted window, and the cores are stitched by the out-sharding.
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


def _axis_windows(size: int, step: int, halo: int):
    """Clamped window anchors along one axis: ([(core_start, read_start)],
    pad). Each window is `step + 2·halo` long and lies fully inside
    [0, size) — the last core is ragged when size % step != 0 — except
    when the axis is shorter than one window, where it is edge-padded up
    to a multiple of 16 and covered by a single whole-axis window
    (`pad` > 0). That window still gets one core anchor per `step` so the
    stitch loop covers the ENTIRE axis — sizes in (step, step + 2·halo)
    need ⌈size/step⌉ cores even though they fit one window (ADVICE r4 #1:
    a single (0, 0) anchor left rows beyond `step` unwritten)."""
    win = step + 2 * halo
    if size >= win:
        return [(i * step, min(max(i * step - halo, 0), size - win))
                for i in range(math.ceil(size / step))], 0
    return [(i * step, 0) for i in range(math.ceil(size / step))], (-size) % 16


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
    # SHIFTED clamped windows (same trick as halo_shard_forward): every
    # tile is the fixed size (tile + 2·halo) but boundary windows shift
    # INWARD so the true image edge coincides with the tile edge — the
    # model then applies its own boundary semantics (zero-pad convs,
    # replicate graph ops) at the real edge, reproducing the whole-image
    # result exactly there. Synthetic halo padding instead leaves an O(1)
    # boundary band whatever the pad mode (measured: reflect 0.124, edge
    # 0.042 max dev on the dryrun toy model); interior tile seams only
    # rely on ≥halo real context (receptive-field decay).
    #
    # Windows are anchored fully inside the TRUE image (ADVICE r3 #1):
    # non-multiple-of-tile sizes get a ragged last core, not edge padding,
    # so the exactness guarantee holds for any H,W ≥ tile + 2·halo. Only
    # when a whole axis is smaller than one window is it edge-padded up to
    # a multiple of 16 (the same padding whole-image inference needs).
    hspan, ph = _axis_windows(h, step, halo)
    wspan, pw = _axis_windows(w, step, halo)
    padded = (np.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")
              if ph or pw else image)
    win_h = min(step + 2 * halo, h + ph)
    win_w = min(step + 2 * halo, w + pw)
    tiles, coords, offs = [], [], []
    for r0, rs in hspan:
        for c0, cs in wspan:
            tiles.append(padded[rs:rs + win_h, cs:cs + win_w])
            coords.append((r0, c0))
            offs.append((r0 - rs, c0 - cs))
    n_dev = mesh.devices.size
    n_pad = (-len(tiles)) % n_dev
    tiles.extend([np.zeros_like(tiles[0])] * n_pad)
    batch = jnp.asarray(np.stack(tiles))
    batch = jax.device_put(batch, NamedSharding(mesh, P("data")))
    outs = np.asarray(jax.jit(apply_fn)(params, batch))

    result = np.zeros_like(image, dtype=np.float32)
    for (r0, c0), (ro, co), o in zip(coords, offs, outs):
        core = o[ro:ro + step, co:co + step]
        r1, c1 = min(r0 + step, h), min(c0 + step, w)
        result[r0:r1, c0:c1] = core[: r1 - r0, : c1 - c0]
    return result


def halo_shard_forward(
    apply_fn: Callable,
    params,
    image: np.ndarray,
    mesh,
    *,
    halo: int = 64,
    axis_name: str = "data",
) -> np.ndarray:
    """Spatially-parallel inference: H sharded over the mesh, halos over ICI.

    The image-restoration analogue of sequence/context parallelism
    (SURVEY.md §5 "long-context"): the reference runs whole images through
    one GPU (scripts_v2/...sigma25.py:267-271); here one image's rows are
    sharded over a device mesh and the ≤`halo`-row receptive-field
    dependencies between neighboring shards are satisfied by exchanging
    edge rows with `lax.ppermute` — two collectives total, both riding ICI.

    Per device the window is *shifted*, not clamped: every device computes
    the model on `rows_per_device + 2·halo` REAL image rows —
      device 0      reads rows [0, hs + 2R)          (true top boundary),
      device i      reads rows [i·hs − R, (i+1)·hs + R),
      device n−1    reads rows [H − hs − 2R, H)      (true bottom boundary)
    — so boundary devices apply the model's replicate-pad semantics at the
    true image edge, and every core pixel either has ≥`halo` rows of real
    context or sits at the true boundary: the same exactness guarantee as
    `tiled_forward` (deviation bounded by the receptive-field decay beyond
    `halo`; measured ≤ 2e-3 at bf16 for halo=64 on the flagship).

    Requirements: `halo % 8 == 0`; H and W are reflect-padded to multiples
    of `16·n_devices` / 16 here and cropped back. `rows_per_device` after
    padding must be ≥ `2·halo` (big images across few devices — the regime
    spatial parallelism is for).
    """
    import jax.lax as lax
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map  # jax ≥ 0.8
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n = int(mesh.devices.size)
    h, w = image.shape[:2]
    if n == 1:
        pad_h, pad_w = (-h) % 16, (-w) % 16
        x = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        return np.asarray(jax.jit(apply_fn)(params, x[None]))[0, :h, :w]

    assert halo % 8 == 0, "halo must be a multiple of 8 (window % 16 == 0)"
    r = halo
    unit = 16 * n
    pad_h = (-h) % unit
    pad_w = (-w) % 16
    x = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    hp = h + pad_h
    hs = hp // n
    assert hs >= 2 * r, (
        f"rows/device {hs} < 2·halo {2 * r}: use fewer devices or less halo")

    def local(params, xb):
        # xb: (1, hs, W, C) — this device's core rows
        i = lax.axis_index(axis_name)
        fwd = [(j, j + 1) for j in range(n - 1)]   # my last rows → next dev
        bwd = [(j, j - 1) for j in range(1, n)]    # my first rows → prev dev
        prev_tail = lax.ppermute(xb[:, -2 * r:], axis_name, fwd)
        next_head = lax.ppermute(xb[:, : 2 * r], axis_name, bwd)
        cat = jnp.concatenate([prev_tail, xb, next_head], axis=1)
        # window offset inside cat: first device starts at its true row 0,
        # middle devices center, last device ends at its true last row
        off = jnp.where(i == 0, 2 * r, jnp.where(i == n - 1, 0, r))
        win = lax.dynamic_slice_in_dim(cat, off, hs + 2 * r, axis=1)
        y = apply_fn(params, win)
        return lax.dynamic_slice_in_dim(y, 2 * r - off, hs, axis=1)

    run = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis_name, None, None)),
        out_specs=P(None, axis_name, None, None),
    ))
    out = run(params, jnp.asarray(x)[None])
    return np.asarray(out)[0, :h, :w]
