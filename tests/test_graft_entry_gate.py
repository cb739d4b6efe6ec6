"""The driver's multichip gate must be reset-proof (VERDICT r4 #1).

The r4 failure: an environment reset moved the repo to a host whose CPU
features didn't match the compile cache's XLA:CPU AOT entries, so every
dryrun leg recompiled cold behind per-entry loader errors and the driver
timed out. Mitigation: a HOST-FINGERPRINT cache-generation marker — on a
host change the stale generation is purged up front (one clean cold
compile instead of error-spam + cold compile). A portable
`--xla_cpu_max_isa` pin was tried first and reverted: on this XLA build
it made the train-step compile pathologically slow (PERF.md round-5).
These tests pin the purge logic; conftest.py calls the same function so
tests and the dryrun share one generation.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as ge


def test_fingerprint_stable_and_nonempty():
    a, b = ge._host_fingerprint(), ge._host_fingerprint()
    assert a == b and len(a) > 8


def test_conftest_uses_gate_purge():
    conftest = open(os.path.join(os.path.dirname(__file__), "conftest.py")).read()
    assert "_reset_proof_cpu_cache" in conftest


def test_cache_generation_purge(tmp_path):
    cache = tmp_path / "jax_compilation"
    cache.mkdir()
    (cache / "stale-entry-cache").write_bytes(b"x" * 16)

    # no marker + entries present -> purge + marker written
    ge._reset_proof_cpu_cache(str(cache))
    assert not (cache / "stale-entry-cache").exists()
    marker = (cache / "CACHE_GENERATION").read_text().strip()
    assert marker == ge._host_fingerprint()

    # matching marker -> entries preserved
    (cache / "good-entry-cache").write_bytes(b"y" * 16)
    ge._reset_proof_cpu_cache(str(cache))
    assert (cache / "good-entry-cache").exists()

    # mismatched marker (another host's fingerprint) -> purge again
    (cache / "CACHE_GENERATION").write_text("cpu_flags=deadbeefdeadbeef\n")
    ge._reset_proof_cpu_cache(str(cache))
    assert not (cache / "good-entry-cache").exists()
    assert (cache / "CACHE_GENERATION").read_text().strip() == (
        ge._host_fingerprint())


def test_empty_cache_gets_marker_without_purge(tmp_path):
    cache = tmp_path / "empty"
    cache.mkdir()
    ge._reset_proof_cpu_cache(str(cache))
    assert (cache / "CACHE_GENERATION").exists()
