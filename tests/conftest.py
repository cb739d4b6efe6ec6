"""Test config: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere, hence the env mutation at
module import time (pytest imports conftest first).
"""

import os

# The environment preloads jax via a sitecustomize (PYTHONPATH=/root/.axon_site)
# with JAX_PLATFORMS=axon pointing at a remote TPU — a hard override (not
# setdefault) plus a config.update after the preload is required to keep the
# test suite on the local virtual-8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: CPU-XLA compiles of stencil-heavy train steps
# take minutes; cache them across test runs/processes.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax_compilation")
os.makedirs(_CACHE_DIR, exist_ok=True)
# Same host-fingerprint generation marker as __graft_entry__.
# _reset_proof_cpu_cache (kept in sync by tests/test_graft_entry_gate.py):
# purge cache generations written on a different host so a host swap never
# pays per-entry cpu_aot_loader rejections (VERDICT r4 #1).
import sys as _sys

_sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from __graft_entry__ import _reset_proof_cpu_cache as _rpc  # noqa: E402

_rpc(_CACHE_DIR)
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "exploration"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="torch reference repo not mounted"
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy test (full-model CPU jit / multi-minute cold "
        "compiles). The fast gate is `pytest -m 'not slow'` — green from a "
        "cold compile cache in <10 min; the full suite needs a warm cache "
        "or ~1 h cold (VERDICT r2 weak #6).",
    )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
