"""Synthetic image corpus for tests and benchmarks (no real datasets are
bundled in this environment). Generates piecewise-smooth color images —
the structure class graph-smoothness priors are designed for — and writes
them as PNGs + the reference CSV index schema."""

from __future__ import annotations

import os

import numpy as np


def make_synthetic_image(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    """Piecewise-smooth uint8 RGB: random gradient background + random
    constant-ish rectangles and a few sinusoid textures."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for c in range(3):
        gx, gy = rng.uniform(-1, 1, 2)
        img[..., c] = 0.5 + 0.3 * (gx * xx / w + gy * yy / h)
    for _ in range(rng.randint(4, 9)):
        r0, c0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
        rh, cw = rng.randint(h // 8, h // 2), rng.randint(w // 8, w // 2)
        color = rng.uniform(0.1, 0.9, 3).astype(np.float32)
        img[r0:r0 + rh, c0:c0 + cw] = 0.8 * color + 0.2 * img[r0:r0 + rh, c0:c0 + cw]
    fx, fy = rng.uniform(0.02, 0.1, 2)
    img[..., rng.randint(3)] += 0.08 * np.sin(2 * np.pi * (fx * xx + fy * yy))
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def write_synthetic_corpus(
    root: str,
    n_images: int = 8,
    size_range: tuple[int, int] = (96, 200),
    seed: int = 0,
    csv_name: str = "index.csv",
) -> str:
    """Write PNGs + CSV index under `root`; returns the CSV path."""
    from PIL import Image

    from irdu_tpu.data.dataset import build_image_index

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n_images):
        h = int(rng.randint(*size_range))
        w = int(rng.randint(*size_range))
        Image.fromarray(make_synthetic_image(rng, h, w)).save(
            os.path.join(img_dir, f"img{i:03d}.png")
        )
    csv_path = os.path.join(root, csv_name)
    build_image_index(root, csv_path)
    return csv_path
