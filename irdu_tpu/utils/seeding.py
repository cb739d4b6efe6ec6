"""Deterministic seeding across numpy / python / jax."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_random_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return a jax PRNGKey for device-side streams."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
