"""Batched loading + device prefetch.

The host side replaces torch `DataLoader(num_workers=4)` with a thread
pool (PIL/numpy release the GIL for the heavy parts); the device side
double-buffers host→HBM transfers with `jax.device_put` so the TPU never
waits on PCIe — the jnp analogue of the reference's pinned-memory prefetch.
For data-parallel training pass a `NamedSharding` and each batch is laid
out across the mesh as it is transferred.
"""

from __future__ import annotations

import collections
import itertools
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator

import jax
import numpy as np


def batched_loader(
    dataset,
    batch_size: int,
    *,
    num_workers: int = 4,
    drop_last: bool = True,
    indices: Iterable[int] | None = None,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (noisy, clean) batches stacked on axis 0."""
    idx_iter = iter(indices) if indices is not None else iter(range(len(dataset)))

    def fetch(i):
        return dataset[i]

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        while True:
            batch_idx = list(itertools.islice(idx_iter, batch_size))
            if not batch_idx or (drop_last and len(batch_idx) < batch_size):
                return
            items = list(pool.map(fetch, batch_idx))
            noisy = np.stack([it[0] for it in items])
            clean = np.stack([it[1] for it in items])
            yield noisy, clean


def device_prefetch(iterator: Iterator, *, size: int = 2, sharding=None) -> Iterator:
    """Double-buffered host→device transfer: keep `size` batches in flight
    so compute overlaps the copy. With a sharding, arrays land distributed."""
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
