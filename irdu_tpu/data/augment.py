"""8-mode dihedral data augmentation.

Matches the reference's `data_augmentation`
(/root/reference/exploration/model_multiscale_mixture_GLR/lib/dataloader_v2.py:22-66):
mode 0 identity, 1 flipud, 2/4/6 rot90×{1,2,3}, 3/5/7 rot+flipud.
Note the reference draws ``randint(0, 7)`` — mode 7 is never sampled; the
sampling helper reproduces that off-by-one for training parity.
"""

from __future__ import annotations

import numpy as np


def dihedral_augment(image: np.ndarray, mode: int) -> np.ndarray:
    if mode == 0:
        out = image
    elif mode == 1:
        out = np.flipud(image)
    elif mode == 2:
        out = np.rot90(image)
    elif mode == 3:
        out = np.flipud(np.rot90(image))
    elif mode == 4:
        out = np.rot90(image, k=2)
    elif mode == 5:
        out = np.flipud(np.rot90(image, k=2))
    elif mode == 6:
        out = np.rot90(image, k=3)
    elif mode == 7:
        out = np.flipud(np.rot90(image, k=3))
    else:
        raise ValueError(f"augment mode must be 0..7, got {mode}")
    return np.ascontiguousarray(out)


def sample_augment_mode(random_state: np.random.RandomState) -> int:
    """The reference's draw: randint(0, 7) — mode 7 unreachable (its
    dataloader off-by-one, kept for exact training-stream parity)."""
    return int(random_state.randint(0, 7))
