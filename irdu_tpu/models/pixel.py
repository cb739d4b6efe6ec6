"""Pixel-domain model tops (the v1–v8 lineage).

`MultiScaleSequenceDenoiser` (reference model_GLR_GTV_deep_v6.py:1041-1082):
a learnable 0.1/0.9 global skip around one pixel-domain `MixtureGTV`
block. The v7 multiblock variant is the same top with n_cnn_fts=128.
`SharpeningBlock` (v6:1020-1039) is the gated-dconv post-filter earlier
versions chained after the solver.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from irdu_tpu.models.restormer_blocks import GatedDConvBlock
from irdu_tpu.solvers.pixel_gtv import MixtureGTV


class SharpeningBlock(nn.Module):
    """Gated-dconv block with a 0.5/0.5 learnable skip (v6:1020-1039)."""

    dim: int
    hidden_features: int

    @nn.compact
    def __call__(self, x):
        sw = self.param(
            "skip_connect_weight",
            lambda key, shape: jnp.array([0.5, 0.5], jnp.float32), (2,),
        )
        y = GatedDConvBlock(dim_out=self.dim, hidden_features=self.hidden_features,
                            name="body")(x)
        return sw[0] * x + sw[1] * y


class MultiScaleSequenceDenoiser(nn.Module):
    n_graphs: int = 24
    n_node_fts: int = 3
    n_cnn_fts: int = 72
    window: str = "diamond12"
    # "scalar" = v5-v8 stats stencils; "none" = the v4 no-stats core —
    # n_graphs=16, n_cnn_fts=48, stats_mode="none" reproduces
    # model_GLR_GTV_deep_v4.py:825-881 / scripts/run_lightformer_GTVGLR.py
    stats_mode: str = "scalar"
    n_cgd_iters: int = 4
    muy_init: Sequence[float] = (0.1, 0.0, 0.0, 0.0)
    ro_init: Sequence[float] = (0.1, 0.0, 0.0, 0.0)
    gamma_init: Sequence[float] = (0.001, 0.0, 0.0, 0.0)
    # feature U-Net depth (v6 reference values; tiny test configs shrink
    # these to keep CPU compile time sane)
    feature_num_blocks: Sequence[int] = (2, 3, 3, 4)
    feature_num_refinement: int = 4
    feature_n_levels: int = 3  # 4 = the v4 full-depth feature U-Net
    # inference-only fused CHW kernel path (see MixtureGTV.use_pallas_unroll)
    use_pallas_solver: bool = False
    # NHWC lane-packed fused unroll (see MixtureGTV.use_nhwc_unroll —
    # VERDICT r4 #4); wins the precedence over the CHW path
    use_nhwc_solver: bool = False
    # training-memory knob (see MixtureGTV.remat)
    remat: bool = False
    # accounting probe (see MixtureGTV.eval_skip_solve)
    eval_skip_solve: bool = False

    @nn.compact
    def __call__(self, patchs: jnp.ndarray) -> jnp.ndarray:
        sw = self.param(
            "skip_connect_weight03",
            lambda key, shape: jnp.array([0.1, 0.9], jnp.float32), (2,),
        )
        y = MixtureGTV(
            nchannels_in=3,
            n_graphs=self.n_graphs,
            n_node_fts=self.n_node_fts,
            n_cnn_fts=self.n_cnn_fts,
            window=self.window,
            stats_mode=self.stats_mode,
            n_cgd_iters=self.n_cgd_iters,
            alpha_init=0.5,
            beta_init=0.1,
            muy_init=self.muy_init,
            ro_init=self.ro_init,
            gamma_init=self.gamma_init,
            feature_num_blocks=self.feature_num_blocks,
            feature_num_refinement=self.feature_num_refinement,
            feature_n_levels=self.feature_n_levels,
            use_pallas_unroll=self.use_pallas_solver,
            use_nhwc_unroll=self.use_nhwc_solver,
            remat=self.remat,
            eval_skip_solve=self.eval_skip_solve,
            name="mixtureGLR_block03",
        )(patchs)
        return sw[0] * patchs + sw[1] * y
