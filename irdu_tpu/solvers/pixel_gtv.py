"""Pixel-domain mixture GTV+GLR solver (the v1–v8 model family).

Behavioural re-implementation of `MixtureGTV`
(/root/reference/exploration/model_multiscale_mixture_GLR/lib/
model_GLR_GTV_deep_v6.py:802-1016): the 3-channel image is replicated
across `n_graphs` mixture hypotheses, a Restormer-style FFBlock U-Net
predicts edge-weight features plus 12 DC channels, the unrolled solve
runs 2 ADMM rounds × 2 CG steps on a *single* scale, and the hypotheses
are combined by a learned softmax score.

Faithful quirks:
  * μ (muys00) and ρ (ro00) are raw (not log) parameters — only γ is
    log-parameterised (v6:862-886; the log-everything change is v12+);
  * the bias accumulates across rounds (b += Cx − ε) and the CG restart
    at round 2 re-initialises the iterate to the new RHS (v6:995);
  * β[0] and β[2] are unused (only β[1], β[3] enter the updates);
  * the stats stencils use scalar coefficients and REFLECT padding
    (v6:456), unlike the flagship's per-channel/replicate.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from irdu_tpu.models.restormer_blocks import FeatureExtraction, GatedDConvBlock
from irdu_tpu.models.layers import GroupedPointwise
from irdu_tpu.ops.graph import (
    extract_edge_weights_flat,
    glr_apply_flat,
    gtv_apply_flat,
    op_c_flat,
    op_c_transpose_flat,
    repeat_per_graph,
    soft_threshold,
)
from irdu_tpu.ops.windows import WINDOWS
from irdu_tpu.solvers.common import GraphOpParams, const_init

N_DC_CHANNELS = 12  # learned DC/low-frequency term channels (v6:840, 860)


class MixtureGTV(nn.Module):
    """Input/output (B, H, W, 3); H, W divisible by 4 (feature U-Net)."""

    nchannels_in: int = 3
    n_graphs: int = 24
    n_node_fts: int = 3
    n_cnn_fts: int = 72
    window: str = "diamond12"
    # "scalar" = the v5-v8 scalar-coefficient stats stencils (v6:456);
    # "none" = the v4/no-stats era core (model_GLR_GTV_deep_v4.py:275-472:
    # GLR/GTVFast with arbitrary connection_window and NO stats conv) —
    # with it this module reproduces scripts/run_lightformer_GTVGLR.py's
    # model exactly (16 graphs, 48 cnn fts, diamond12, stats disabled).
    stats_mode: str = "scalar"
    n_cgd_iters: int = 4
    alpha_init: float = 0.5
    beta_init: float = 0.1
    muy_init: Sequence[float] = (0.1, 0.0, 0.0, 0.0)
    ro_init: Sequence[float] = (0.1, 0.0, 0.0, 0.0)
    gamma_init: Sequence[float] = (0.001, 0.0, 0.0, 0.0)
    feature_num_blocks: Sequence[int] = (2, 3, 3, 4)
    feature_num_refinement: int = 4
    # 3 = the v5+ truncated feature U-Net; 4 = the v4-era full Restormer
    # depth (model_GLR_GTV_deep_v4.py:195-273)
    feature_n_levels: int = 3
    ffn_expansion_factor: float = 2.6666
    # Inference fast path: run the unroll through the fused CHW Pallas
    # kernels (ops/pallas/solver_chw.py, generalized to the 12-edge
    # diamond window + reflect stats padding). Shapes that don't qualify
    # fall back to the jnp path; the jnp path stays authoritative.
    use_pallas_unroll: bool = False
    # NHWC lane-packed fused unroll (ops/pallas/pixel_nhwc.py — VERDICT
    # r4 #4): all G hypotheses ride the lane axis per program, 6 fused
    # segment kernels per forward. Takes precedence over the CHW path
    # when the shape qualifies; jnp path stays authoritative.
    use_nhwc_unroll: bool = False
    nhwc_tile_h: int = 16
    # accounting probe (scripts/microbench_pixel.py --variants features):
    # skip the unrolled solve at COMPILE time, leaving feature U-Net +
    # DC estimator + combination — the frame's non-solver share. Not a
    # deployment knob; quality is meaningless with it set.
    eval_skip_solve: bool = False
    # training-memory knob: rematerialize the feature U-Net per FFBlock
    # and the solver unroll per segment (init-RHS / CG round / rethresh)
    # — without it the v6-scale backward exceeds 16 GB HBM at 256²+
    # patches. Numerically identical (jax.checkpoint recompute).
    remat: bool = False

    def setup(self):
        if self.n_cgd_iters != 4:
            raise NotImplementedError(
                "the reference unroll is fixed at 4 CG iterations (2 ADMM rounds)"
            )
        g = self.n_graphs
        self.deltas = WINDOWS[self.window]
        self.n_total_fts = g * self.n_node_fts

        self.alpha_cgd = self.param("alphaCGD", const_init(self.alpha_init), (self.n_cgd_iters, g))
        self.beta_cgd = self.param("betaCGD", const_init(self.beta_init), (self.n_cgd_iters, g))

        self.features = FeatureExtraction(
            out_channels=self.n_total_fts + N_DC_CHANNELS,
            dim=self.n_cnn_fts,
            num_blocks=self.feature_num_blocks,
            num_refinement_blocks=self.feature_num_refinement,
            ffn_expansion_factor=self.ffn_expansion_factor,
            n_levels=self.feature_n_levels,
            remat=self.remat,
            name="patchs_features_extraction",
        )
        self.combination_weight = GroupedPointwise(
            features=g, name="combination_weight")
        self.dc_estimator = GatedDConvBlock(
            dim_out=self.nchannels_in, hidden_features=N_DC_CHANNELS * 2,
            name="dc_estimator")

        # raw μ/ρ, log γ (v6:862-886)
        self.ro00 = self.param("ro00", const_init(float(self.ro_init[0])), (g,))
        self.muys00 = self.param("muys00", const_init(float(self.muy_init[0])), (g,))
        self.gamma00 = self.param("gamma00", const_init(float(np.log(self.gamma_init[0]))), (g,))

        self.gtv00 = GraphOpParams(g, self.n_node_fts, stats_mode=self.stats_mode, name="GTVmodule00")
        self.glr00 = GraphOpParams(g, self.n_node_fts, stats_mode=self.stats_mode, name="GLRmodule00")

    def _system_matvec(self, x, w_gtv, w_glr):
        """A = I + μ·GLR + ρ·GTV, single scale (v6:892-911).

        Flat lane-packed layout (VERDICT r3 #7): x is (B,H,W,G·F) with the
        24 hypotheses × 3 features on the channel/lane axis (72 ≈ half a
        lane), so every diamond12 stencil shift runs once over all
        hypotheses instead of per-(graph, feature) slivers — the same
        flat-channel form that bought the flagship 2.7×/1.8× (ops/graph.py
        flat section)."""
        d = self.deltas
        mu_c = repeat_per_graph(self.muys00, self.n_node_fts)
        ro_c = repeat_per_graph(self.ro00, self.n_node_fts)
        out = x
        out = out + mu_c * glr_apply_flat(
            x, w_glr, d, self.glr00.stats, "reflect")
        out = out + ro_c * gtv_apply_flat(
            x, w_gtv, d, self.gtv00.stats, "reflect")
        return out

    def _rhs(self, y_tiled, eps_minus_bias, w_gtv):
        ct = op_c_transpose_flat(
            eps_minus_bias, w_gtv, self.deltas, self.gtv00.stats)
        return repeat_per_graph(self.ro00, self.n_node_fts) * ct + y_tiled

    def _pg(self, vec, i):
        return jnp.repeat(vec[i], self.n_node_fts)

    def _chw_ok(self, shape) -> bool:
        _, h, w, _ = shape
        return h % 8 == 0 and w % 128 == 0

    @staticmethod
    def _mega_ok(shape) -> bool:
        """Whole-unroll kernel qualifier (ops/pallas/solver_unroll.py):
        one (H, W) f32 plane + this family's 24 per-graph 12-edge weight
        planes must fit VMEM (same H·W ≤ 512² bound as the flagship)."""
        from irdu_tpu.solvers.gtv_glr import _MEGA_MAX_PIXELS

        _, h, w, _ = shape
        return h % 8 == 0 and w % 128 == 0 and h * w <= _MEGA_MAX_PIXELS

    def _forward_chw(self, patchs: jnp.ndarray) -> jnp.ndarray:
        """The same unroll through the fused CHW kernels (single scale,
        diamond-12 window, reflect stats). Mirrors __call__ step for step;
        same reference citations apply."""
        import functools

        from irdu_tpu.ops.pallas.solver_chw import (
            _stats_pg,
            edge_weights_chw,
            fused_scal,
            gg_fused_step_chw,
        )

        b, h, w, c = patchs.shape
        d, g = self.deltas, self.n_graphs
        interp = jax.default_backend() != "tpu"

        feats = self.features(patchs)
        ew_feats = feats[..., : self.n_total_fts]
        dc_feats = feats[..., self.n_total_fts:]
        dc_term = self.dc_estimator(dc_feats)
        y_tilde = patchs - dc_term

        def chw(a):
            return jnp.transpose(a, (0, 3, 1, 2))

        # both ops' weights in one kernel call: 2G stacked graphs over the
        # duplicated feature planes (same features, different metric)
        fc = chw(ew_feats)
        w_all = edge_weights_chw(
            jnp.concatenate([fc, fc], axis=1),
            jnp.concatenate([self.gtv00.multi_m, self.glr00.multi_m], axis=0),
            n_graphs=2 * g, true_h=h, true_w=w, deltas=d, interpret=interp)
        w_gtv, w_glr = w_all[:, :g], w_all[:, g:]

        pgtv = _stats_pg(self.gtv00.stats, g, self.n_node_fts)
        pglr = _stats_pg(self.glr00.stats, g, self.n_node_fts)
        gamma = jnp.exp(self.gamma00)

        if self._mega_ok(patchs.shape):
            # The ENTIRE unroll as one pallas_call, one grid program per
            # (b, graph, plane); the G-fold tiling of ỹ never materializes
            # (ops/pallas/solver_unroll.gg_pixel_unroll_chw).
            from irdu_tpu.ops.pallas.solver_unroll import (
                gg_pixel_unroll_chw,
                pixel_unroll_scal,
            )

            out = gg_pixel_unroll_chw(
                chw(y_tilde), w_gtv, w_glr, pgtv, pglr,
                pixel_unroll_scal(g, self.muys00, self.ro00, gamma,
                                  self.alpha_cgd, self.beta_cgd),
                n_graphs=g, deltas=d, interpret=interp)
            out = jnp.transpose(out, (0, 2, 3, 1))
            logits = self.combination_weight(ew_feats)
            score = jax.nn.softmax(logits, axis=-1)
            out_g = out.reshape(b, h, w, g, self.nchannels_in)
            combined = jnp.sum(out_g * score[..., None], axis=3)
            return combined + dc_term

        # Whole unroll steps as single fused kernels (single scale; CG
        # axpys + β-momentum folded in-kernel): 6 pallas_calls total.
        fused = functools.partial(
            gg_fused_step_chw, w_gtv1=None, w_glr1=None, pgtv1=None,
            pglr1=None, n_graphs=g, true_h=h, true_w=w, deltas=d,
            stats_mode="reflect", interpret=interp)

        def scal_cg(i, with_beta):
            return fused_scal(
                g, mu0=self.muys00, ro0=self.ro00, alpha=self.alpha_cgd[i],
                beta=self.beta_cgd[i] if with_beta else None)

        y = chw(jnp.tile(y_tilde, (1, 1, 1, g)))

        # round 1: rhs = ỹ + ρ·CᵀC ỹ (bias 0)
        rhs = fused(y, None, None, w_gtv, None, pgtv0=pgtv, pglr0=None,
                    scal=fused_scal(g, ro0=self.ro00), mode="rhs")
        out, update = fused(rhs, None, None, w_gtv, w_glr, pgtv0=pgtv,
                            pglr0=pglr, scal=scal_cg(0, False), mode="cg",
                            use_x_rhs=True, emit_update=True)
        out = fused(out, rhs, update, w_gtv, w_glr, pgtv0=pgtv, pglr0=pglr,
                    scal=scal_cg(1, True), mode="cg")

        # ADMM re-threshold (bias was 0, so ε−bias = 2·S_γ(Cx) − Cx)
        rhs = fused(out, y, None, w_gtv, None, pgtv0=pgtv, pglr0=None,
                    scal=fused_scal(g, ro0=self.ro00, gamma0=gamma),
                    mode="rethresh")

        # round 2: CG restart from the new RHS (v6:995)
        out, update = fused(rhs, None, None, w_gtv, w_glr, pgtv0=pgtv,
                            pglr0=pglr, scal=scal_cg(2, False), mode="cg",
                            use_x_rhs=True, emit_update=True)
        out = fused(out, rhs, update, w_gtv, w_glr, pgtv0=pgtv, pglr0=pglr,
                    scal=scal_cg(3, True), mode="cg")

        out = jnp.transpose(out, (0, 2, 3, 1))

        # mixture combination: softmax score over graphs (v6:850-858, 1011)
        logits = self.combination_weight(ew_feats)
        score = jax.nn.softmax(logits, axis=-1)
        out_g = out.reshape(b, h, w, g, self.nchannels_in)
        combined = jnp.sum(out_g * score[..., None], axis=3)
        return combined + dc_term

    def _forward_nhwc(self, patchs: jnp.ndarray) -> jnp.ndarray:
        """The same unroll through the NHWC lane-packed fused segment
        kernels (ops/pallas/pixel_nhwc.py). Signals run in PLANAR channel
        order c = f·G + g inside the kernels; conversion happens here
        (ỹ replication and the final (F, G) split are layout-free)."""
        from irdu_tpu.ops.pallas.pixel_nhwc import pixel_unroll_nhwc

        b, h, w, _ = patchs.shape
        g, f = self.n_graphs, self.n_node_fts
        d = tuple(tuple(x) for x in self.deltas)
        interp = jax.default_backend() != "tpu"

        feats = self.features(patchs)
        ew_feats = feats[..., : self.n_total_fts]
        dc_feats = feats[..., self.n_total_fts:]
        dc_term = self.dc_estimator(dc_feats)
        y_tilde = patchs - dc_term

        from irdu_tpu.ops.graph import extract_edge_weights_packed

        w_gtv = extract_edge_weights_packed(
            ew_feats, self.gtv00.multi_m, d, g).astype(patchs.dtype)
        w_glr = extract_edge_weights_packed(
            ew_feats, self.glr00.multi_m, d, g).astype(patchs.dtype)

        # planar ỹ: channel c = f·G + g  ⇒  repeat each image channel G×
        y72 = jnp.repeat(y_tilde, g, axis=-1)

        def p4(s):
            return jnp.concatenate(
                [s["p01"], s["p02a"], s["p02b"], s["p03"]])

        p = jnp.stack([p4(self.gtv00.stats), p4(self.glr00.stats)])
        scal = {
            "mu": jnp.tile(self.muys00, f),
            "ro": jnp.tile(self.ro00, f),
            "gamma": jnp.tile(jnp.exp(self.gamma00), f),
            "alpha": jnp.tile(self.alpha_cgd, (1, f)),
            "beta": jnp.tile(self.beta_cgd, (1, f)),
        }
        out = pixel_unroll_nhwc(
            y72, w_gtv, w_glr, p, scal, n_graphs=g, deltas=d,
            tile_h=self.nhwc_tile_h, interpret=interp)

        logits = self.combination_weight(ew_feats)
        score = jax.nn.softmax(logits, axis=-1)
        out_fg = out.reshape(b, h, w, f, g)
        combined = jnp.einsum("bhwfg,bhwg->bhwf", out_fg,
                              score.astype(out_fg.dtype))
        return combined + dc_term

    def _nhwc_ok(self, shape) -> bool:
        _, h, w, _ = shape
        return h % self.nhwc_tile_h == 0 and w % 128 == 0

    def __call__(self, patchs: jnp.ndarray) -> jnp.ndarray:
        if self.eval_skip_solve:
            b, h, w, _ = patchs.shape
            g = self.n_graphs
            feats = self.features(patchs)
            ew_feats = feats[..., : self.n_total_fts]
            dc_term = self.dc_estimator(feats[..., self.n_total_fts:])
            score = jax.nn.softmax(self.combination_weight(ew_feats), axis=-1)
            y = (patchs - dc_term)[..., None, :] * score[..., None]
            return jnp.sum(y, axis=3) + dc_term
        # The fused kernels implement the scalar-stats/reflect variant
        # only; the no-stats (v4) core takes the jnp path.
        if (self.use_nhwc_unroll and self.stats_mode == "scalar"
                and self._nhwc_ok(patchs.shape)):
            return self._forward_nhwc(patchs)
        if (self.use_pallas_unroll and self.stats_mode == "scalar"
                and self._chw_ok(patchs.shape)):
            return self._forward_chw(patchs)

        b, h, w, c = patchs.shape
        d, g = self.deltas, self.n_graphs
        # segment-level rematerialization: each ckpt'd segment saves only
        # its (plane-sized) inputs for the backward pass and recomputes
        # the 12-edge neighbor/stats intermediates. The closed-over
        # params (stats stencils, α/β/μ/ρ) are tiny residuals.
        ckpt = jax.checkpoint if self.remat else (lambda f: f)

        feats = self.features(patchs)
        ew_feats = feats[..., : self.n_total_fts]
        dc_feats = feats[..., self.n_total_fts:]

        # Materialize the graph-op submodule params OUTSIDE the
        # checkpointed closures: flax runs a submodule's setup lazily on
        # first attribute access, and creating params inside a
        # jax.checkpoint trace leaks the traced values out of the remat
        # scope (UnexpectedTracerError at model.init with remat=True).
        _ = (self.gtv00.multi_m, self.glr00.multi_m)

        @ckpt
        def edge_weights(ew_feats):
            # flat form: tuple of E arrays (B,H,W,G·F), weights repeated
            # over the F node features (lane-packed — VERDICT r3 #7)
            w_gtv = extract_edge_weights_flat(ew_feats, self.gtv00.multi_m, d, g)
            w_glr = extract_edge_weights_flat(ew_feats, self.glr00.multi_m, d, g)
            return w_gtv, w_glr

        w_gtv, w_glr = edge_weights(ew_feats)

        dc_term = self.dc_estimator(dc_feats)
        y_tilde = patchs - dc_term
        # replicate across graphs: (B,H,W,G·3)
        y_tiled = jnp.tile(y_tilde, (1, 1, 1, g))

        gamma_c = jnp.repeat(jnp.exp(self.gamma00), self.n_node_fts)

        @ckpt
        def init_rhs(y_tiled, w_gtv):
            # round 1: ε = C·ỹ, bias = 0
            eps = op_c_flat(y_tiled, w_gtv, d, self.gtv00.stats, "reflect")
            return self._rhs(y_tiled, eps, w_gtv)

        @ckpt
        def cg_round(rhs, w_gtv, w_glr, a0, b1, a1):
            out = rhs
            res = rhs - self._system_matvec(out, w_gtv, w_glr)
            update = res
            out = out + a0 * update
            res = rhs - self._system_matvec(out, w_gtv, w_glr)
            update = res + b1 * update
            return out + a1 * update

        @ckpt
        def rethresh_rhs(out, y_tiled, w_gtv):
            # ADMM re-threshold with accumulating bias (v6:983-989); the
            # bias entering this fixed 2-round unroll is 0, so
            # bias' = C·x − ε and the new RHS uses ε − bias' = 2ε − C·x.
            cx = op_c_flat(out, w_gtv, d, self.gtv00.stats, "reflect")
            eps = tuple(soft_threshold(cx_e, gamma_c) for cx_e in cx)
            bias = tuple(cx_e - e_e for cx_e, e_e in zip(cx, eps))
            return self._rhs(
                y_tiled, tuple(e_e - b_e for e_e, b_e in zip(eps, bias)),
                w_gtv)

        rhs = init_rhs(y_tiled, w_gtv)
        out = cg_round(rhs, w_gtv, w_glr,
                       self._pg(self.alpha_cgd, 0),
                       self._pg(self.beta_cgd, 1),
                       self._pg(self.alpha_cgd, 1))

        rhs = rethresh_rhs(out, y_tiled, w_gtv)

        # round 2: CG restart from the new RHS (v6:995)
        out = cg_round(rhs, w_gtv, w_glr,
                       self._pg(self.alpha_cgd, 2),
                       self._pg(self.beta_cgd, 3),
                       self._pg(self.alpha_cgd, 3))

        # mixture combination: softmax score over graphs (v6:850-858, 1011)
        logits = self.combination_weight(ew_feats)  # (B,H,W,G)
        score = jax.nn.softmax(logits, axis=-1)
        out_g = out.reshape(b, h, w, g, self.nchannels_in)
        combined = jnp.sum(out_g * score[..., None], axis=3)
        return combined + dc_term
