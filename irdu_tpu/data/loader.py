"""Batched loading + device prefetch.

The host side replaces torch `DataLoader(num_workers=4)` with two backends:

  * "native"  — the C++ batch assembler (`data/native/`): crop, pad,
    augment, normalize and Gaussian degradation run in C++ threads with
    bit-exact numpy RNG parity, entirely off the Python main thread (the
    analogue of torch's native worker pool, SURVEY §2.9);
  * "python"  — a thread pool over `dataset[i]` (PIL/numpy release the GIL
    for the heavy parts).

"auto" (default) picks native when the dataset supports it and the
compiled library is available, and transparently falls back otherwise —
both produce bit-identical batches (tests/test_native_data.py).

The device side double-buffers host→HBM transfers with `jax.device_put`
so the TPU never waits on PCIe — the jnp analogue of the reference's
pinned-memory prefetch. For data-parallel training pass a `NamedSharding`
and each batch is laid out across the mesh as it is transferred.
"""

from __future__ import annotations

import collections
import itertools
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator

import jax
import numpy as np


def _python_fetch(dataset, batch_idx):
    items = [dataset[i] for i in batch_idx]
    noisy = np.stack([it[0] for it in items])
    clean = np.stack([it[1] for it in items])
    return noisy, clean


def batched_loader(
    dataset,
    batch_size: int,
    *,
    num_workers: int = 4,
    drop_last: bool = True,
    indices: Iterable[int] | None = None,
    backend: str = "auto",
    skip_batches: int = 0,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (noisy, clean) batches stacked on axis 0.

    One worker thread assembles batch k+1 while batch k is consumed (the
    assembly itself is parallel across items: C++ threads in the native
    backend, a GIL-releasing pool in the python one).

    skip_batches: fast-forward the index stream by N batches WITHOUT
    materializing them (mid-stage resume). Item content is a pure
    function of (dataset seed, index) — dataset.py __getitem__ — so the
    stream after an index-only skip is bit-identical to replaying; a
    materializing replay costs full loader time (~0.2 s/batch measured),
    which at a late resume point would be hours.
    """
    idx_iter = iter(indices) if indices is not None else iter(range(len(dataset)))
    if skip_batches:
        next(itertools.islice(idx_iter, skip_batches * batch_size,
                              skip_batches * batch_size), None)

    use_native = backend == "native" or (
        backend == "auto"
        and hasattr(dataset, "native_compatible")
        and dataset.native_compatible()
    )
    if backend not in ("auto", "native", "python"):
        raise ValueError(f"unknown loader backend: {backend}")

    item_pool = None if use_native else ThreadPoolExecutor(max_workers=num_workers)

    def fetch(batch_idx, allow_fallback=(backend == "auto")):
        if use_native:
            try:
                return dataset.get_batch(batch_idx, num_threads=num_workers)
            except Exception:
                if not allow_fallback:
                    raise
                return _python_fetch(dataset, batch_idx)
        if item_pool is not None:
            items = list(item_pool.map(dataset.__getitem__, batch_idx))
            noisy = np.stack([it[0] for it in items])
            clean = np.stack([it[1] for it in items])
            return noisy, clean
        return _python_fetch(dataset, batch_idx)

    def batches():
        while True:
            batch_idx = list(itertools.islice(idx_iter, batch_size))
            if not batch_idx or (drop_last and len(batch_idx) < batch_size):
                return
            yield batch_idx

    try:
        with ThreadPoolExecutor(max_workers=1) as prefetcher:
            pending = collections.deque()
            for batch_idx in batches():
                pending.append(prefetcher.submit(fetch, batch_idx))
                if len(pending) >= 2:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
    finally:
        if item_pool is not None:
            item_pool.shutdown(wait=False)


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
