"""Metrics with the reference eval's exact quantization conventions."""

from __future__ import annotations

import numpy as np


def img_as_ubyte(x: np.ndarray) -> np.ndarray:
    """skimage.img_as_ubyte semantics for float input in [-1, 1]:
    clip(rint(x·255), 0, 255) → uint8. The reference quantizes restored
    images this way before computing PSNR (scripts_v2/...sigma25.py:279),
    a ~0.01-0.05 dB effect that matters for the parity budget."""
    return np.clip(np.rint(np.asarray(x, dtype=np.float64) * 255.0), 0, 255).astype(np.uint8)


def psnr_255(reference_255: np.ndarray, restored_255: np.ndarray) -> float:
    """PSNR in the 255-scale uint8 domain: 20·log10(255/√MSE)."""
    mse = float(np.mean(np.square(
        np.asarray(reference_255, np.float64) - np.asarray(restored_255, np.float64)
    )))
    if mse == 0:
        return float("inf")
    return 20.0 * float(np.log10(255.0 / np.sqrt(mse)))


def psnr_unit(reference: np.ndarray, restored: np.ndarray) -> float:
    """PSNR on [0,1] floats (the training-log metric, 10·log10(1/MSE))."""
    ref = np.clip(np.asarray(reference, np.float64), 0.0, 1.0)
    res = np.clip(np.asarray(restored, np.float64), 0.0, 1.0)
    mse = float(np.mean(np.square(ref - res)))
    if mse == 0:
        return float("inf")
    return 10.0 * float(np.log10(1.0 / mse))
