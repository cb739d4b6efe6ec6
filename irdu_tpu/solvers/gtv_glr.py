"""The flagship latent-space two-scale GGTV+GGLR unrolled ADMM/CG solver.

Re-implements the *behaviour* of the reference `MixtureGTVGLR`
(/root/reference/exploration/GGTV_GGLR_v1.0/deep_multiscale_GGLR_GGTV_v1x0.py:526-811)
as an NHWC flax module over the pure ops core. The unroll is reproduced
quirk-for-quirk — these are load-bearing for checkpoint/PSNR parity:

  * the solver runs exactly 3 CG-style steps with learnable per-graph
    α (all three used) and β (only β[2] used; β[0], β[1] are parameters
    that receive no gradient, as in the reference where the β[1] term is
    commented out at :785);
  * the ADMM re-linearisation happens once, between CG step 1 and 2, and
    the new RHS (`left_hand_sizeB`) is reused for steps 2 and 3;
  * `op_C`'s degree argument is fed GLR weights at :738/:745/:757 in the
    reference — inert, since the degree is unused by op_C/op_Cᵀ; our ops
    simply don't take it;
  * the bias update uses ε−bias = 2·S_γ(Cx) − Cx.

TPU-first layout: everything rides the flat-channel (B, H, W, C) form,
including the edge weights (tuple of E lane-aligned arrays, pre-repeated
over node features — see ops.graph flat section; 2-3x faster than the
grouped (B,H,W,G,E) layout on v5e). Solving is linear in the signal given
the edge weights, so the whole unroll fuses into one XLA stencil pipeline
per scale; `use_pallas_unroll` routes the unroll through the fused CHW
band kernels in ops.pallas.solver_chw.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from irdu_tpu.models.layers import Downsample2x2, GroupedPointwise, box_down2x2, box_up2x2
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

from irdu_tpu.solvers.common import GraphOpParams, const_init as _const_init

# Whole-unroll kernel VMEM budget, as a plane-size bound (patchable in
# tests to force the band-kernel route).
_MEGA_MAX_PIXELS = 768 * 1024


class MixtureGTVGLR(nn.Module):
    """Latent two-scale GGTV+GGLR unroll. Input/output: (B, H, W, C) with
    C = n_graphs · n_node_fts; H, W must be even."""

    n_graphs: int
    n_node_fts: int
    alpha_init: float = 0.5
    beta_init: float = 0.1
    muy_init: Sequence[float] = (0.001, 0.0001)
    ro_init: Sequence[float] = (0.0001, 0.0001)
    gamma_init: Sequence[float] = (0.0001, 0.0001)
    window: str = "cross4"
    stats_mode: str = "per_channel"  # "scalar" / "none" for older variants
    feature_head: str = "pointwise"  # "nonlinear3" = 3 LocalNonLinearBlocks
    # + 1x1 expand (the no_latent_no_mixture GTVGLR head,
    # model_GLR_GTV_deep_v13_no_latent_no_mixture.py:612-697)
    n_cgd_iters: int = 3  # fixed in the reference (v1x0.py:544)
    # Inference-time FLOP reduction (NOT in the reference): truncate the
    # unroll after k CG steps (1 ≤ k ≤ 3). k=3 is the exact reference
    # semantics; k=2 drops the last matvec (~25% of solver FLOPs), k=1
    # additionally drops the ADMM re-threshold round. Quality impact is
    # measured, not assumed — see PERF.md's PSNR-vs-MP/s table.
    eval_cg_iters: int = 3
    # Cut XLA fusion at the edge weights and at every CG iterate. Without
    # the cuts XLA's producer-duplication heuristic recomputes the softmax
    # weight chains and earlier iterates into every consumer fusion, and
    # the unroll's cost grows superlinearly with composition depth
    # (measured: the whole solver costs ~4x the sum of its ops). Numerics
    # are unchanged — optimization_barrier is an identity.
    fusion_cuts: bool = True
    # Inference fast path: run the unroll through the fused CHW Pallas
    # kernels (ops/pallas/solver_chw.py — space on lanes, compact per-graph
    # edge-weight planes). Falls back to the jnp path when shapes don't
    # qualify (see _chw_ok) or under interpret-less autodiff (the kernels
    # have no VJP; the trainer keeps the jnp path).
    use_pallas_unroll: bool = False

    def setup(self):
        g = self.n_graphs
        c = g * self.n_node_fts
        self.deltas = WINDOWS[self.window]

        self.alpha_cgd = self.param("alphaCGD", _const_init(self.alpha_init), (self.n_cgd_iters, g))
        self.beta_cgd = self.param("betaCGD", _const_init(self.beta_init), (self.n_cgd_iters, g))

        if self.feature_head == "pointwise":
            # full-res head: 1×1 conv C -> 2C, no bias (v1x0.py:556-566)
            self.feat00 = GroupedPointwise(features=2 * c, name="patchs_features_extraction00")
            # half-res head: 2×2 stride-2 conv C -> C, then 1×1 C -> 2C (v1x0.py:593-612)
            self.feat01_down = Downsample2x2(features=c, name="patchs_features_extraction01_down")
            self.feat01_point = GroupedPointwise(features=2 * c, name="patchs_features_extraction01_point")
        elif self.feature_head == "nonlinear3":
            from irdu_tpu.solvers.ablation_solvers import _NonLinearHead

            self.feat00 = _NonLinearHead(c, 2 * c, name="patchs_features_extraction00")
            self.feat01_down = Downsample2x2(features=c, name="patchs_features_extraction01_down")
            self.feat01_point = _NonLinearHead(c, 2 * c, name="patchs_features_extraction01_head")
        else:
            raise ValueError(self.feature_head)

        # log-parameterized positive weights (the v12→v13 change)
        self.ro00 = self.param("ro00", _const_init(float(np.log(self.ro_init[0]))), (g,))
        self.ro01 = self.param("ro01", _const_init(float(np.log(self.ro_init[1]))), (g,))
        self.gamma00 = self.param("gamma00", _const_init(float(np.log(self.gamma_init[0]))), (g,))
        self.gamma01 = self.param("gamma01", _const_init(float(np.log(self.gamma_init[1]))), (g,))
        self.muys00 = self.param("muys00", _const_init(float(np.log(self.muy_init[0]))), (g,))
        self.muys01 = self.param("muys01", _const_init(float(np.log(self.muy_init[1]))), (g,))

        self.gtv00 = GraphOpParams(g, self.n_node_fts, stats_mode=self.stats_mode, name="GTVmodule00")
        self.glr00 = GraphOpParams(g, self.n_node_fts, stats_mode=self.stats_mode, name="GLRmodule00")
        self.gtv01 = GraphOpParams(g, self.n_node_fts, stats_mode=self.stats_mode, name="GTVmodule01")
        self.glr01 = GraphOpParams(g, self.n_node_fts, stats_mode=self.stats_mode, name="GLRmodule01")

    # -- helpers ---------------------------------------------------------

    def _chan(self, vec_g):
        """exp(per-graph log-param) broadcast per channel: (G,) -> (C,)."""
        return repeat_per_graph(jnp.exp(vec_g), self.n_node_fts)

    def _system_matvec(self, x, w_gtv, w_glr, p):
        """A·x for the two-scale system
        A = I + μ₀·GLR₀ + ρ₀·GTV₀ + Up(μ₁·GLR₁ + ρ₁·GTV₁)Down
        (reference apply_lightweight_transformer, v1x0.py:642-682)."""
        d = self.deltas
        out = x
        out = out + p["mu00"] * glr_apply_flat(x, w_glr[0], d, self.glr00.stats)
        out = out + p["ro00"] * gtv_apply_flat(x, w_gtv[0], d, self.gtv00.stats)
        x2 = box_down2x2(x)
        temp = p["mu01"] * glr_apply_flat(x2, w_glr[1], d, self.glr01.stats)
        temp = temp + p["ro01"] * gtv_apply_flat(x2, w_gtv[1], d, self.gtv01.stats)
        return out + box_up2x2(temp)

    def _rhs(self, y, eps00, eps01, w_gtv00, w_gtv01, p):
        """RHS build: y + ρ₀·Cᵀ₀ε₀ + ρ₁·Up(Cᵀ₁ε₁) (v1x0.py:744-749, 776-781)."""
        d = self.deltas
        rhs = y + p["ro00"] * op_c_transpose_flat(eps00, w_gtv00, d, self.gtv00.stats)
        up = box_up2x2(op_c_transpose_flat(eps01, w_gtv01, d, self.gtv01.stats))
        return rhs + p["ro01"] * up

    def _alpha(self, i):
        """α[i] / β[i] broadcast per channel: (G,) -> (C,)."""
        return repeat_per_graph(self.alpha_cgd[i], self.n_node_fts)

    def _beta(self, i):
        return repeat_per_graph(self.beta_cgd[i], self.n_node_fts)

    # -- forward ---------------------------------------------------------

    def _cut(self, t):
        """Identity that blocks XLA fusion/recompute across it (see
        fusion_cuts). Works on arrays or (nested) tuples of arrays."""
        if not self.fusion_cuts:
            return t
        import jax

        return jax.lax.optimization_barrier(t)

    def _chw_ok(self, shape) -> bool:
        """The CHW kernels need cross-4 edges, H and H/2 multiples of 8,
        and full 128-lane widths. Two kernel flavours cover the shapes:
        the whole-unroll kernel (see _mega_ok: one pallas_call for the
        entire solve, full plane in VMEM — sub-128 widths ride lane-
        padded, so flagship scale3 at W=64 qualifies) and the per-step
        band kernels (W and W/2 both 128-multiples). Shapes satisfying
        neither fall through to the jnp path."""
        _, h, w, _ = shape
        return (self.window == "cross4"
                and h % 16 == 0 and (h // 2) % 8 == 0
                and (w % 256 == 0 or self._mega_ok(shape)))

    @staticmethod
    def _mega_ok(shape) -> bool:
        """Whole-unroll kernel qualifier (ops/pallas/solver_unroll.py):
        one (H, W) f32 plane plus per-graph weights must fit VMEM
        (H·W ≤ 768·1024 measured safe on v5e — planes above 512² request
        the 112 MB large-plane limit, solver_unroll._VMEM_LARGE). The
        max(H, Wp) ≤ 1024 guard bounds the in-kernel 0/1 resample
        matrices (rd/ru are (H/2, H), cd/cu (W, W1P) — they grow with
        the square of one extent, so an extreme-aspect plane could OOM
        VMEM where 768×1024 fits). Widths that are not 128-multiples are
        lane-padded (full- and half-res operands), masked in-kernel
        against the true width, and cropped on the way out; W must be
        even (the in-solver 2× scale)."""
        _, h, w, _ = shape
        wp = -(-w // 128) * 128
        return (h % 16 == 0 and w % 2 == 0 and h * wp <= _MEGA_MAX_PIXELS
                and max(h, wp) <= 1024)

    def _forward_chw(self, patchs: jnp.ndarray,
                     chw_in: bool = False) -> jnp.ndarray:
        """The same unroll routed through the fused CHW Pallas kernels
        (ops/pallas/solver_chw.py). Numerics match the jnp path to bf16
        tolerance; every step cites the same reference lines.

        chw_in: patchs is already (B, C, H, W) (the model-level CHW fast
        path) — the feature heads run as CHW einsums on the stored flax
        params and the result stays CHW."""
        from irdu_tpu.ops.pallas.solver_chw import (
            _stats_pg,
            edge_weights_chw,
            fused_scal,
            gg_fused_step_chw,
        )

        import jax

        if chw_in:
            b, c, h, w = patchs.shape
        else:
            b, h, w, c = patchs.shape
        g, f = self.n_graphs, self.n_node_fts
        h2, w2 = h // 2, w // 2
        interp = jax.default_backend() != "tpu"  # CPU tests run interpreted
        mega = self._mega_ok((b, h, w, c))

        def chw(a):
            return jnp.transpose(a, (0, 3, 1, 2))

        if chw_in:
            from irdu_tpu.models.chw import downsample2x2_chw, pointwise_chw

            f00 = pointwise_chw(
                patchs, self.feat00.variables["params"]["kernel"])
            f01 = pointwise_chw(
                downsample2x2_chw(
                    patchs, self.feat01_down.variables["params"]["kernel"]),
                self.feat01_point.variables["params"]["kernel"])
        else:
            # feature heads stay NHWC (1×1 convs on the MXU), then transpose
            f00 = chw(self.feat00(patchs))
            f01 = chw(self.feat01_point(self.feat01_down(patchs)))
        # Lane padding (whole-unroll path only): when W or W/2 is not a
        # 128-multiple (flagship scale2: W/2=64; scale3: W=64), pad the
        # FEATURES — the weight kernel then emits lane-padded weight planes
        # whose pad columns never leak (solver_unroll.py docstring).
        pad0 = (-w) % 128 if mega else 0
        pad1 = (-w2) % 128 if mega else 0
        if pad0:
            f00 = jnp.pad(f00, ((0, 0), (0, 0), (0, 0), (0, pad0)))
        if pad1:
            f01 = jnp.pad(f01, ((0, 0), (0, 0), (0, 0), (0, pad1)))
        # GTV and GLR features share the head output (B, 2C, H, W) with
        # aligned (graph, feature) grouping — extract both ops' weights in
        # ONE kernel call by treating them as 2G graphs.
        ew = functools.partial(edge_weights_chw, n_graphs=2 * g,
                               interpret=interp)
        w00 = ew(f00, jnp.concatenate(
            [self.gtv00.multi_m, self.glr00.multi_m], axis=0),
            true_h=h, true_w=w)
        w_gtv00, w_glr00 = w00[:, :g], w00[:, g:]
        w01 = ew(f01, jnp.concatenate(
            [self.gtv01.multi_m, self.glr01.multi_m], axis=0),
            true_h=h2, true_w=w2)
        w_gtv01, w_glr01 = w01[:, :g], w01[:, g:]

        pglr00 = _stats_pg(self.glr00.stats, g, f)
        pgtv00 = _stats_pg(self.gtv00.stats, g, f)
        pglr01 = _stats_pg(self.glr01.stats, g, f)
        pgtv01 = _stats_pg(self.gtv01.stats, g, f)
        pg = lambda v: jnp.exp(v)
        mu00, mu01 = pg(self.muys00), pg(self.muys01)
        ro00, ro01 = pg(self.ro00), pg(self.ro01)
        gamma00, gamma01 = pg(self.gamma00), pg(self.gamma01)

        if mega:
            # The ENTIRE unroll as one pallas_call per filtering block —
            # one grid program per (b, graph, node-feature plane), iterate/
            # RHS/momentum resident in VMEM (ops/pallas/solver_unroll.py).
            from irdu_tpu.ops.pallas.solver_unroll import (
                gg_unroll_chw,
                unroll_scal,
            )

            y = patchs if chw_in else chw(patchs)
            if pad0:
                y = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, pad0)))
            out = gg_unroll_chw(
                y, w_gtv00, w_glr00, w_gtv01, w_glr01,
                pgtv00, pglr00, pgtv01, pglr01,
                unroll_scal(g, mu00, ro00, mu01, ro01, gamma00, gamma01,
                            self.alpha_cgd, self.beta_cgd),
                n_graphs=g, eval_cg_iters=self.eval_cg_iters,
                true_w=w if pad0 else None,
                interpret=interp)
            return out if chw_in else jnp.transpose(out, (0, 2, 3, 1))

        # Whole unroll steps as single fused two-scale kernels (box 2×2
        # down/up folded in-kernel as MXU matmuls; CG axpys folded): one
        # pallas_call per step instead of ~12 + XLA glue per block.
        fused = functools.partial(
            gg_fused_step_chw, n_graphs=g, true_h=h, true_w=w,
            interpret=interp)

        def scal_cg(i, with_beta=False):
            return fused_scal(
                g, mu0=mu00, ro0=ro00, mu1=mu01, ro1=ro01,
                alpha=self.alpha_cgd[i],
                beta=self.beta_cgd[i] if with_beta else None)

        y = patchs if chw_in else chw(patchs)
        out_t = (lambda a: a) if chw_in else (
            lambda a: jnp.transpose(a, (0, 2, 3, 1)))

        # ADMM init RHS: y + ρ₀·Cᵀ₀C₀y + ρ₁·Up(Cᵀ₁C₁·Down y)  (v1x0.py:738-749)
        rhs_a = fused(y, None, None, w_gtv00, None, w_gtv01, None,
                      pgtv00, None, pgtv01, None,
                      fused_scal(g, ro0=ro00, ro1=ro01), mode="rhs")

        # CG step 1 (v1x0.py:751-753) — x₀ = RHS itself, so rhs ≡ x
        out01 = fused(rhs_a, None, None, w_gtv00, w_glr00, w_gtv01, w_glr01,
                      pgtv00, pglr00, pgtv01, pglr01, scal_cg(0),
                      mode="cg", use_x_rhs=True)
        if self.eval_cg_iters == 1:
            return out_t(out01)

        # ADMM re-threshold + new RHS (v1x0.py:757-781)
        rhs_b = fused(out01, y, None, w_gtv00, None, w_gtv01, None,
                      pgtv00, None, pgtv01, None,
                      fused_scal(g, ro0=ro00, ro1=ro01, gamma0=gamma00,
                                 gamma1=gamma01), mode="rethresh")

        # CG steps 2–3 with β-momentum (β[1] unused by design, v1x0.py:784-790)
        emit = self.eval_cg_iters >= 3
        step2 = fused(out01, rhs_b, None, w_gtv00, w_glr00, w_gtv01, w_glr01,
                      pgtv00, pglr00, pgtv01, pglr01, scal_cg(1),
                      mode="cg", emit_update=emit)
        if self.eval_cg_iters == 2:
            return out_t(step2)
        out02, update01 = step2
        out03 = fused(out02, rhs_b, update01, w_gtv00, w_glr00, w_gtv01,
                      w_glr01, pgtv00, pglr00, pgtv01, pglr01,
                      scal_cg(2, with_beta=True), mode="cg")

        return out_t(out03)

    def __call__(self, patchs: jnp.ndarray, chw: bool = False) -> jnp.ndarray:
        if chw:
            # (B, C, H, W) in/out — the model-level CHW fast path.
            b, c, h, w = patchs.shape
            if (self.use_pallas_unroll
                    and not self.is_initializing()
                    and self.feature_head == "pointwise"
                    and self._chw_ok((b, h, w, c))):
                return self._forward_chw(patchs, chw_in=True)
            from irdu_tpu.models.chw import from_chw, to_chw

            return to_chw(self.__call__(from_chw(patchs)))
        if self.use_pallas_unroll and self._chw_ok(patchs.shape):
            return self._forward_chw(patchs)

        d, g = self.deltas, self.n_graphs

        # edge weights at both scales, for GTV and GLR
        f00 = self.feat00(patchs)
        f_gtv00, f_glr00 = jnp.split(f00, 2, axis=-1)
        w_gtv00 = self._cut(extract_edge_weights_flat(f_gtv00, self.gtv00.multi_m, d, g))
        w_glr00 = self._cut(extract_edge_weights_flat(f_glr00, self.glr00.multi_m, d, g))

        f01 = self.feat01_point(self.feat01_down(patchs))
        f_gtv01, f_glr01 = jnp.split(f01, 2, axis=-1)
        w_gtv01 = self._cut(extract_edge_weights_flat(f_gtv01, self.gtv01.multi_m, d, g))
        w_glr01 = self._cut(extract_edge_weights_flat(f_glr01, self.glr01.multi_m, d, g))

        w_gtv = (w_gtv00, w_gtv01)
        w_glr = (w_glr00, w_glr01)

        # per-channel positive scalars, computed once
        p = dict(
            mu00=self._chan(self.muys00), mu01=self._chan(self.muys01),
            ro00=self._chan(self.ro00), ro01=self._chan(self.ro01),
        )

        y = patchs
        y_half = box_down2x2(y)

        # ADMM init: ε = C·y at both scales, bias 0 (v1x0.py:738-749)
        eps_a00 = op_c_flat(y, w_gtv00, d, self.gtv00.stats)
        eps_a01 = op_c_flat(y_half, w_gtv01, d, self.gtv01.stats)
        rhs_a = self._rhs(y, eps_a00, eps_a01, w_gtv00, w_gtv01, p)

        # CG step 1 (v1x0.py:751-753) — x₀ = RHS itself
        out00 = self._cut(rhs_a)
        res00 = out00 - self._system_matvec(out00, w_gtv, w_glr, p)
        out01 = self._cut(out00 + self._alpha(0) * res00)
        if self.eval_cg_iters == 1:
            return out01

        # ADMM re-threshold + new RHS (v1x0.py:757-781)
        gamma00_c = self._chan(self.gamma00)
        gamma01_c = self._chan(self.gamma01)
        temp_b00 = op_c_flat(out01, w_gtv00, d, self.gtv00.stats)
        temp_b01 = op_c_flat(box_down2x2(out01), w_gtv01, d, self.gtv01.stats)
        # ε − bias = 2·S_γ(Cx) − Cx, per edge
        rhs_eps00 = tuple(2.0 * soft_threshold(t, gamma00_c) - t for t in temp_b00)
        rhs_eps01 = tuple(2.0 * soft_threshold(t, gamma01_c) - t for t in temp_b01)
        rhs_b = self._cut(self._rhs(y, rhs_eps00, rhs_eps01, w_gtv00, w_gtv01, p))

        # CG steps 2–3 with β-momentum (β[1] unused by design, v1x0.py:784-790)
        res01 = rhs_b - self._system_matvec(out01, w_gtv, w_glr, p)
        update01 = self._cut(res01)
        out02 = self._cut(out01 + self._alpha(1) * update01)
        if self.eval_cg_iters == 2:
            return out02

        res03 = rhs_b - self._system_matvec(out02, w_gtv, w_glr, p)
        update03 = res03 + self._beta(2) * update01
        out03 = out02 + self._alpha(2) * update03

        return out03
