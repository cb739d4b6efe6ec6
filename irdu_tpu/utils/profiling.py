"""Tracing / profiling / FLOP accounting (SURVEY.md §5).

The reference imports torch.profiler everywhere but only ever uses manual
time.time() deltas and one notebook FlopCounterMode run. TPU-native
equivalents: jax.profiler traces (TensorBoard/XProf format) and XLA's
cost analysis for FLOP counts.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable

import jax


def enable_compile_cache(repo_root: str | None = None) -> None:
    """Point JAX at the repo-local persistent compile cache
    (.cache/jax_compilation). Mosaic/pallas-heavy programs take minutes to
    compile cold through this rig's tunnel; with the cache they restore in
    seconds. Safe to call repeatedly (no-op if already configured)."""
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    cache_dir = os.path.join(repo_root, ".cache", "jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf:
    ``with trace("/tmp/trace"): fn()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (torch record_function equivalent)."""
    return jax.profiler.TraceAnnotation(name)


def count_flops(fn: Callable, *args, **kwargs) -> float:
    """Total FLOPs of `fn(*args)` per XLA cost analysis (the jnp analogue
    of torch FlopCounterMode; the reference reports 246.97 GFLOPs for the
    flagship at 1×3×336×496, README.ipynb cell 6)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):  # older jax returns one dict per device
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0))


class StepTimer:
    """Rolling per-step wall-clock timer matching the reference's training
    log format (`iter=.. time=..`)."""

    def __init__(self):
        self._t = time.time()

    def lap(self) -> float:
        now = time.time()
        dt = now - self._t
        self._t = now
        return dt
