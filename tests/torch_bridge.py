"""Load the PyTorch reference implementation for parity testing.

The reference repo is mounted read-only at /root/reference; tests that use
this module are skipped when it is absent. Nothing in the irdu_tpu package
imports torch or this module — it exists only so the test suite can check
our jnp operators bit-for-bit against the original.
"""

from __future__ import annotations

import importlib.util
import sys

REFERENCE_LIB = (
    "/root/reference/exploration/model_multiscale_mixture_GLR/lib"
)
REFERENCE_V1X0 = (
    "/root/reference/exploration/GGTV_GGLR_v1.0/deep_multiscale_GGLR_GGTV_v1x0.py"
)

_cache: dict[str, object] = {}


def load_reference_module(path: str, name: str):
    if name in _cache:
        return _cache[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _cache[name] = mod
    return mod


def load_v1x0():
    """The flagship model file (v13-semantics)."""
    return load_reference_module(REFERENCE_V1X0, "ref_v1x0")


def load_lib(version: str):
    """Load lib/model_GLR_GTV_deep_<version>.py from the reference."""
    return load_reference_module(
        f"{REFERENCE_LIB}/model_GLR_GTV_deep_{version}.py", f"ref_{version}"
    )
