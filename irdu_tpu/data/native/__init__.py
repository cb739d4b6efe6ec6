"""ctypes bindings for the native (C++) input pipeline.

Builds `libirdu_data.so` from `irdu_data.cc` on first use (g++, ~2 s) and
caches it next to the source. Everything degrades gracefully: if no
compiler is available the callers fall back to the pure-numpy path, so the
package stays importable on machines without a toolchain.

The native path is the analogue of the reference's torch
`DataLoader(num_workers=4)` native worker pool (SURVEY §2.9: host-side
prefetch is the reference's only concurrency); here it assembles whole
(noisy, clean) batches in C++ threads with BIT-EXACT numpy RNG parity
(tests/test_native_data.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "irdu_data.cc")
_LIB = os.path.join(_DIR, "libirdu_data.so")

_lock = threading.Lock()
_lib = None
_load_error: str | None = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _load_error
    with _lock:
        if _lib is not None or _load_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
        except Exception as e:  # no compiler / load failure -> numpy fallback
            _load_error = str(e)
            return None

        lib.irdu_rng_probe.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.irdu_rng_probe.restype = None
        lib.irdu_make_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),            # images
            ctypes.POINTER(ctypes.c_int32),             # img_hw
            ctypes.POINTER(ctypes.c_int32),             # crops
            ctypes.POINTER(ctypes.c_uint8),             # pad_flags
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # n, ph, pw
            ctypes.c_uint64,                            # seed
            ctypes.POINTER(ctypes.c_int64),             # indices
            ctypes.c_int32, ctypes.c_int32,             # use_aug, dist_mode
            ctypes.POINTER(ctypes.c_double),            # levels
            ctypes.POINTER(ctypes.c_double),            # probs
            ctypes.c_int32, ctypes.c_double, ctypes.c_int32,  # n_lv, lam, clip
            ctypes.POINTER(ctypes.c_float),             # out_noisy
            ctypes.POINTER(ctypes.c_float),             # out_clean
            ctypes.c_int32,                             # n_threads
        ]
        lib.irdu_make_pairs.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_error() -> str | None:
    _load()
    return _load_error


def rng_probe(seed: int, idx: int, kind: int, n: int,
              probs=None) -> np.ndarray:
    """Test hook: n draws of `kind` from the (seed, idx) item RNG.
    kind: 0 raw u32, 1 randint(0,7), 2 normal, 3 random_sample, 4 choice."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native lib unavailable: {_load_error}")
    out = np.empty(n, np.float64)
    p = np.ascontiguousarray(probs if probs is not None else [], np.float64)
    lib.irdu_rng_probe(
        seed, idx, kind, n,
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


_DIST_MODES = {
    "none": 0, "": 0, None: 0,
    "addictive_noise": 1,
    "addictive_noise_scale": 2,
    "vary_addictive_noise": 3,
}


def make_pairs(
    images: list[np.ndarray],
    crops: np.ndarray,          # (n, 2) int32 row/col
    pad_flags: np.ndarray,      # (n,) uint8
    indices: np.ndarray,        # (n,) int64 dataset indices
    *,
    patch_size: tuple[int, int],
    seed: int,
    use_aug: bool,
    dist_mode: str,
    lambda_noise,
    clip: bool,
    num_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Assemble (noisy, clean) float32 batches natively.

    `images[k]` is the uint8 HWC (3-channel, C-contiguous) source image for
    item k. Bit-exact with `PatchDataset.__getitem__` for every item.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native lib unavailable: {_load_error}")

    n = len(images)
    ph, pw = patch_size
    oh, ow = (ph // 16) * 16, (pw // 16) * 16

    mode = _DIST_MODES[dist_mode] if dist_mode in _DIST_MODES else None
    if mode is None:
        raise ValueError(f"native path does not support dist_mode={dist_mode}")
    if mode == 3:
        levels, probs = lambda_noise
        levels = np.ascontiguousarray(levels, np.float64)
        probs = np.ascontiguousarray(probs, np.float64)
        lam = 0.0
    else:
        levels = np.zeros(1, np.float64)
        probs = np.zeros(1, np.float64)
        lam = float(lambda_noise) if mode else 0.0

    img_ptrs = (ctypes.c_void_p * n)()
    img_hw = np.empty((n, 2), np.int32)
    for k, im in enumerate(images):
        assert im.dtype == np.uint8 and im.ndim == 3 and im.shape[2] == 3, (
            "native path needs uint8 HWC 3-channel images")
        assert im.flags["C_CONTIGUOUS"]
        img_ptrs[k] = im.ctypes.data
        img_hw[k] = im.shape[:2]

    crops = np.ascontiguousarray(crops, np.int32)
    pad_flags = np.ascontiguousarray(pad_flags, np.uint8)
    indices = np.ascontiguousarray(indices, np.int64)
    out_noisy = np.empty((n, oh, ow, 3), np.float32)
    out_clean = np.empty((n, oh, ow, 3), np.float32)

    if num_threads <= 0:
        num_threads = min(n, os.cpu_count() or 1)

    rc = lib.irdu_make_pairs(
        img_ptrs,
        img_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        crops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pad_flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, ph, pw, seed,
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(use_aug), mode,
        levels.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(levels), lam, int(clip),
        out_noisy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_clean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads)
    if rc != 0:
        raise RuntimeError(f"irdu_make_pairs failed: rc={rc}")
    return out_noisy, out_clean
