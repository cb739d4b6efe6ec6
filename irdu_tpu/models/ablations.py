"""Ablation model tops (the v13_no_* lineage).

  MultiScaleGraphFilter   — "no latent": replicate the image across graphs,
                            run the flagship two-scale solver in pixel
                            space, 1×1 combine
                            (model_GLR_GTV_deep_v13_no_latent.py:887-926)
  OneGraphFilter          — "no latent, no mixture": one graph over a
                            96-channel replication; solver selectable:
      solver="two_scale_nl"  v13-style two-scale GTVGLR with the
                             nonlinear feature head (_no_latent_no_mixture)
      solver="single"        single-scale no-orders GTVGLR (_no_orders)
      solver="single_split"  + split GLR/GTV heads (_no_orders_split)
      solver="single_noGTV"  GLR-only CG (_no_orders_noGTV)
                            Output head reads only the first 3 channels
                            (reference quirk, no_orders.py:589).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from irdu_tpu.models.layers import GroupedPointwise
from irdu_tpu.solvers.ablation_solvers import GLRSingleScale, GTVGLRSingleScale
from irdu_tpu.solvers.gtv_glr import MixtureGTVGLR


class MultiScaleGraphFilter(nn.Module):
    n_channels_in: int = 3
    n_channels_out: int = 3
    ngraphs: int = 16
    window: str = "cross4"

    @nn.compact
    def __call__(self, img):
        g = self.ngraphs
        x = jnp.tile(img, (1, 1, 1, g))
        # the no_latent file's MixtureGTVGLR uses the 3-block nonlinear
        # feature heads (v13_no_latent.py:556-...), unlike the flagship
        x = MixtureGTVGLR(
            n_graphs=g,
            n_node_fts=self.n_channels_in,
            alpha_init=0.5,
            beta_init=0.1,
            muy_init=(0.001, 0.0001),
            ro_init=(0.0001, 0.0001),
            gamma_init=(0.0001, 0.0001),
            window=self.window,
            feature_head="nonlinear3",
            name="localfilter",
        )(x)
        return GroupedPointwise(features=self.n_channels_out,
                                name="linear_combination")(x)


class OneGraphFilter(nn.Module):
    n_channels_in: int = 3
    n_channels_hidden: int = 96
    n_channels_out: int = 3
    solver: str = "single"
    window: str = "cross4"

    @nn.compact
    def __call__(self, img):
        reps = self.n_channels_hidden // self.n_channels_in
        x = jnp.tile(img, (1, 1, 1, reps))
        common = dict(n_graphs=1, n_node_fts=self.n_channels_hidden,
                      alpha_init=0.5, beta_init=0.1, window=self.window)
        if self.solver == "two_scale_nl":
            x = MixtureGTVGLR(
                muy_init=(0.001, 0.0001), ro_init=(1e-6, 1e-6),
                gamma_init=(1e-6, 1e-6), feature_head="nonlinear3",
                name="localfilter", **common)(x)
        elif self.solver == "single":
            x = GTVGLRSingleScale(
                muy_init=0.001, ro_init=1e-6, gamma_init=1e-6,
                name="localfilter", **common)(x)
        elif self.solver == "single_split":
            x = GTVGLRSingleScale(
                muy_init=0.001, ro_init=1e-6, gamma_init=1e-6,
                split_heads=True, name="localfilter", **common)(x)
        elif self.solver == "single_noGTV":
            x = GLRSingleScale(muy_init=0.001, name="localfilter", **common)(x)
        else:
            raise ValueError(self.solver)
        # reference quirk: only the first 3 channels feed the output head
        x = x[..., : self.n_channels_in]
        return GroupedPointwise(features=self.n_channels_out,
                                name="linear_combination")(x)
