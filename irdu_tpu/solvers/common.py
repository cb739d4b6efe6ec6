"""Shared solver parameter containers."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def const_init(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


class GraphOpParams(nn.Module):
    """Learnable parameters of one GLR/GTV graph operator: the metric
    diagonal and the polynomial-stencil mixing coefficients.

    stats_mode:
      "per_channel" — (G, F) coefficients (flagship v13; reference
                      v1x0.py:56-125 keeps (C,1,1,1));
      "scalar"      — scalar coefficients (v5–v8 family;
                      model_GLR_GTV_deep_v6.py:311-365 keeps shape (1,));
      "none"        — stencil disabled (*_no_orders ablations).
    """

    n_graphs: int
    n_node_fts: int
    m_diag_init: float = 1.0
    stats_mode: str = "per_channel"

    def setup(self):
        g, f = self.n_graphs, self.n_node_fts
        self.multi_m = self.param("multiM", const_init(self.m_diag_init), (g, f))
        inits = {"p01": 1.0, "p02a": 0.5, "p02b": 0.5, "p03": 0.5}
        if self.stats_mode == "per_channel":
            self._stats = {
                k: self.param(f"stats_{k}", const_init(v), (g, f))
                for k, v in inits.items()
            }
        elif self.stats_mode == "scalar":
            self._stats = {
                k: self.param(f"stats_{k}", const_init(v), (1,))
                for k, v in inits.items()
            }
        elif self.stats_mode == "none":
            self._stats = None
        else:
            raise ValueError(self.stats_mode)

    @property
    def stats(self):
        if self._stats is None:
            return None
        return {k: v.reshape(-1) if v.ndim > 1 else v for k, v in self._stats.items()}

    def __call__(self):  # params-only module
        raise NotImplementedError
