"""Learning-rate schedules matching the reference trainers.

The flagship scheme (scripts_v2/run_abtract_lightformer_GGTV_GGLR_sigma25.py:
146-163): Adam base lr 4e-4; MultiStepLR ×0.5^0.25 at every 50k up to 600k;
then switch to CosineAnnealing from base 5e-5 down to 1e-6 with T_max 701k
(stepping from 0 at the switch, per torch SequentialLR semantics).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _n_decays(step, milestones: Sequence[int]):
    """Count of passed milestones, built from scalar comparisons only.

    Deliberately avoids a jnp milestone array: array-valued closure
    constants in a grad graph trigger a pathological (minutes-long)
    compile in this environment's TPU compiler, while scalar constants
    are fine (measured: 0.5s vs 200-640s for otherwise identical HLO).
    """
    n = jnp.zeros((), jnp.float32)
    for m in sorted(milestones):
        n = n + (jnp.asarray(step) >= m).astype(jnp.float32)
    return n


def multistep_then_cosine(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float,
    switch_step: int,
    cosine_base_lr: float,
    cosine_t_max: int,
    eta_min: float,
):
    def schedule(step):
        step = jnp.asarray(step)
        lr_multi = base_lr * gamma ** _n_decays(step, milestones)
        t = jnp.maximum(step - switch_step, 0).astype(jnp.float32)
        lr_cos = eta_min + (cosine_base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / cosine_t_max)
        )
        return jnp.where(step < switch_step, lr_multi, lr_cos)

    return schedule


def flagship_lr_schedule():
    return multistep_then_cosine(
        base_lr=4e-4,
        milestones=[50000 * i for i in range(1, 13)],
        gamma=float(np.sqrt(np.sqrt(0.5))),
        switch_step=600000,
        cosine_base_lr=5e-5,
        cosine_t_max=701000,
        eta_min=1e-6,
    )


def multistep_schedule(base_lr: float, milestones: Sequence[int], gamma: float):
    """The pixel-domain family scheme (scripts/run_lightformer_*: MultiStepLR
    [200k, 500k, 650k] ×0.5)."""

    def schedule(step):
        return base_lr * gamma ** _n_decays(step, milestones)

    return schedule
