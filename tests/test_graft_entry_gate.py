"""The driver's multichip gate must be reset-proof (VERDICT r4 #1).

The r4 failure: an environment reset moved the repo to a host whose CPU
features didn't match the compile cache's XLA:CPU AOT entries, so every
dryrun leg recompiled cold behind per-entry loader errors and the driver
timed out. The mitigation is (a) a pinned portable codegen target
(`--xla_cpu_max_isa`) so entries survive host swaps, and (b) a cache
GENERATION marker that purges unpinned/mismatched generations instead of
paying per-entry AOT rejections. These tests pin that logic and keep
conftest.py's copy of the marker in sync with `__graft_entry__`.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as ge


def test_conftest_isa_pin_matches_gate():
    conftest = open(os.path.join(os.path.dirname(__file__), "conftest.py")).read()
    assert f"cpu_max_isa={ge._DRYRUN_CPU_ISA}" in conftest
    assert f"--xla_cpu_max_isa={ge._DRYRUN_CPU_ISA}" in conftest


def test_cache_generation_purge(tmp_path):
    cache = tmp_path / "jax_compilation"
    cache.mkdir()
    (cache / "stale-entry-cache").write_bytes(b"x" * 16)

    # no marker + entries present -> purge + marker written
    ge._reset_proof_cpu_cache(str(cache))
    assert not (cache / "stale-entry-cache").exists()
    marker = (cache / "CACHE_GENERATION").read_text().strip()
    assert marker == f"cpu_max_isa={ge._DRYRUN_CPU_ISA}"

    # matching marker -> entries preserved
    (cache / "good-entry-cache").write_bytes(b"y" * 16)
    ge._reset_proof_cpu_cache(str(cache))
    assert (cache / "good-entry-cache").exists()

    # mismatched marker (older pin) -> purge again
    (cache / "CACHE_GENERATION").write_text("cpu_max_isa=SSE4_2\n")
    ge._reset_proof_cpu_cache(str(cache))
    assert not (cache / "good-entry-cache").exists()
    assert (cache / "CACHE_GENERATION").read_text().strip() == (
        f"cpu_max_isa={ge._DRYRUN_CPU_ISA}")


def test_empty_cache_gets_marker_without_purge(tmp_path):
    cache = tmp_path / "empty"
    cache.mkdir()
    ge._reset_proof_cpu_cache(str(cache))
    assert (cache / "CACHE_GENERATION").exists()
