"""Single-scale GTV+GLR / GLR-only solvers for the ablation studies.

Re-implements the `GTVGLR` / `GLR` solvers of the *_no_orders ablation
files (/root/reference/exploration/model_multiscale_mixture_GLR/lib/
model_GLR_GTV_deep_v13_no_orders.py:369-551, _no_orders_noGTV.py:367-500,
_no_orders_split.py:369-...):

  * single spatial scale (no 2× latent pyramid);
  * feature head = 3 stacked LocalNonLinearBlocks + 1×1 expansion
    (instead of the flagship's bare 1×1);
  * the polynomial stencil ("orders") is deleted: stats_mode="none";
  * unlike the flagship, β[1] IS used here (update01 includes
    β[1]·res00 — no_orders.py:540);
  * noGTV drops the GTV branch entirely: no ADMM, RHS = y, 3 plain CG
    steps (and the reference's `output02` reuse at noGTV:489-491 is an
    inert naming quirk — the math is a normal third step);
  * the "split" variant halves the input channels and runs separate
    GLR/GTV feature heads on each half.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from irdu_tpu.models.blocks import LocalNonLinearBlock
from irdu_tpu.models.layers import GroupedPointwise
from irdu_tpu.ops.graph import (
    extract_edge_weights,
    glr_apply,
    gtv_apply,
    op_c,
    op_c_transpose,
    per_graph_scale,
    soft_threshold,
)
from irdu_tpu.ops.windows import WINDOWS
from irdu_tpu.solvers.common import GraphOpParams, const_init


class _NonLinearHead(nn.Module):
    """3× LocalNonLinearBlock + optional 1×1 expand (no_orders.py:399-425;
    the noGTV variant's head has NO final conv, _no_orders_noGTV.py:397-411)."""

    channels: int
    out_channels: int
    with_expand: bool = True

    @nn.compact
    def __call__(self, x):
        hidden = int(self.channels * 8 / 3)
        for i in range(3):
            x = LocalNonLinearBlock(self.channels, hidden, 1, name=f"block_{i}")(x)
        if not self.with_expand:
            return x
        return GroupedPointwise(features=self.out_channels, name="expand")(x)


class GTVGLRSingleScale(nn.Module):
    """Single-scale GTV+GLR unroll (ablation `GTVGLR`)."""

    n_graphs: int
    n_node_fts: int
    alpha_init: float = 0.5
    beta_init: float = 0.1
    muy_init: float = 0.001
    ro_init: float = 1e-6
    gamma_init: float = 1e-6
    window: str = "cross4"
    stats_mode: str = "none"
    split_heads: bool = False
    n_cgd_iters: int = 3

    def setup(self):
        g = self.n_graphs
        c = g * self.n_node_fts
        self.deltas = WINDOWS[self.window]
        self.alpha_cgd = self.param("alphaCGD", const_init(self.alpha_init), (self.n_cgd_iters, g))
        self.beta_cgd = self.param("betaCGD", const_init(self.beta_init), (self.n_cgd_iters, g))
        if self.split_heads:
            self.head_glr = _NonLinearHead(c // 2, c, name="patchs_features_extractionGLR")
            self.head_gtv = _NonLinearHead(c // 2, c, name="patchs_features_extractionGTV")
        else:
            self.head = _NonLinearHead(c, 2 * c, name="patchs_features_extraction00")
        self.ro00 = self.param("ro00", const_init(float(np.log(self.ro_init))), (g,))
        self.gamma00 = self.param("gamma00", const_init(float(np.log(self.gamma_init))), (g,))
        self.muys00 = self.param("muys00", const_init(float(np.log(self.muy_init))), (g,))
        self.gtv00 = GraphOpParams(g, self.n_node_fts, stats_mode=self.stats_mode, name="GTVmodule00")
        self.glr00 = GraphOpParams(g, self.n_node_fts, stats_mode=self.stats_mode, name="GLRmodule00")

    def _matvec(self, x, w_gtv, w_glr):
        d, g = self.deltas, self.n_graphs
        out = x + per_graph_scale(
            glr_apply(x, w_glr, d, g, self.glr00.stats), jnp.exp(self.muys00))
        return out + per_graph_scale(
            gtv_apply(x, w_gtv, d, g, self.gtv00.stats), jnp.exp(self.ro00))

    def _alpha(self, i):
        return jnp.repeat(self.alpha_cgd[i], self.n_node_fts)

    def _beta(self, i):
        return jnp.repeat(self.beta_cgd[i], self.n_node_fts)

    def __call__(self, patchs: jnp.ndarray) -> jnp.ndarray:
        d, g = self.deltas, self.n_graphs
        if self.split_heads:
            f_gtv_in, f_glr_in = jnp.split(patchs, 2, axis=-1)
            f_glr = self.head_glr(f_glr_in)
            f_gtv = self.head_gtv(f_gtv_in)
        else:
            f = self.head(patchs)
            f_gtv, f_glr = jnp.split(f, 2, axis=-1)
        w_gtv, _ = extract_edge_weights(f_gtv, self.gtv00.multi_m, d, g)
        w_glr, _ = extract_edge_weights(f_glr, self.glr00.multi_m, d, g)

        y = patchs
        eps_a = op_c(y, w_gtv, d, g, self.gtv00.stats)
        rhs_a = y + per_graph_scale(
            op_c_transpose(eps_a, w_gtv, d, g, self.gtv00.stats),
            jnp.exp(self.ro00))

        out00 = rhs_a
        res00 = rhs_a - self._matvec(out00, w_gtv, w_glr)
        out01 = out00 + self._alpha(0) * res00

        gamma_c = jnp.repeat(jnp.exp(self.gamma00), self.n_node_fts)
        temp = op_c(out01, w_gtv, d, g, self.gtv00.stats)
        rhs_eps = tuple(2.0 * soft_threshold(t, gamma_c) - t for t in temp)
        rhs_b = y + per_graph_scale(
            op_c_transpose(rhs_eps, w_gtv, d, g, self.gtv00.stats),
            jnp.exp(self.ro00))

        # β[1] IS used in this lineage (no_orders.py:540)
        res01 = rhs_b - self._matvec(out01, w_gtv, w_glr)
        update01 = res01 + self._beta(1) * res00
        out02 = out01 + self._alpha(1) * update01

        res03 = rhs_b - self._matvec(out02, w_gtv, w_glr)
        update03 = res03 + self._beta(2) * update01
        out03 = out02 + self._alpha(2) * update03
        return out03


class GLRSingleScale(nn.Module):
    """GLR-only 3-step CG unroll, no ADMM (noGTV ablation `GLR`,
    _no_orders_noGTV.py:367-500; also the shape of v10's MixtureGLR —
    pass stats_mode='per_channel' + a pointwise head for that)."""

    n_graphs: int
    n_node_fts: int
    alpha_init: float = 0.5
    beta_init: float = 0.1
    muy_init: float = 0.001
    window: str = "cross4"
    stats_mode: str = "none"
    n_cgd_iters: int = 3

    def setup(self):
        g = self.n_graphs
        c = g * self.n_node_fts
        self.deltas = WINDOWS[self.window]
        self.alpha_cgd = self.param("alphaCGD", const_init(self.alpha_init), (self.n_cgd_iters, g))
        self.beta_cgd = self.param("betaCGD", const_init(self.beta_init), (self.n_cgd_iters, g))
        self.head = _NonLinearHead(c, c, with_expand=False,
                                   name="patchs_features_extraction00")
        self.muys00 = self.param("muys00", const_init(float(np.log(self.muy_init))), (g,))
        self.glr00 = GraphOpParams(g, self.n_node_fts, stats_mode=self.stats_mode, name="GLRmodule00")

    def _matvec(self, x, w_glr):
        d, g = self.deltas, self.n_graphs
        return x + per_graph_scale(
            glr_apply(x, w_glr, d, g, self.glr00.stats), jnp.exp(self.muys00))

    def __call__(self, patchs: jnp.ndarray) -> jnp.ndarray:
        d, g = self.deltas, self.n_graphs
        f_glr = self.head(patchs)
        w_glr, _ = extract_edge_weights(f_glr, self.glr00.multi_m, d, g)

        def a(i):
            return jnp.repeat(self.alpha_cgd[i], self.n_node_fts)

        def b(i):
            return jnp.repeat(self.beta_cgd[i], self.n_node_fts)

        y = patchs
        out00 = y
        res00 = y - self._matvec(out00, w_glr)
        out01 = out00 + a(0) * res00
        res01 = y - self._matvec(out01, w_glr)
        update01 = res01 + b(1) * res00
        out02 = out01 + a(1) * update01
        res02 = y - self._matvec(out02, w_glr)
        update02 = res02 + b(2) * update01
        return out02 + a(2) * update02
