"""Graph stencil operators (L1 core).

Re-expresses the reference's graph-operator machinery
(`GLRFast`/`GTVFast`, /root/reference/exploration/GGTV_GGLR_v1.0/
deep_multiscale_GGLR_GGTV_v1x0.py:13-523) as pure, fusible jnp functions:

  * per-pixel learned edge weights via feature similarity + softmax
  * random-walk graph Laplacian matvec  L x = x − W·x_nbr
  * graph gradient C / divergence Cᵀ (the GTV split operators)
  * the "generalized" polynomial stencil conv (stats_conv) and its adjoint

Layout (TPU-first): all signal tensors are flat-channel NHWC ``(B, H, W, C)``
with C = G·F (G graphs × F node features, channel c ↔ (g = c//F, f = c%F),
matching the reference's channel order). C rides the 128-wide lane
dimension; the (G, F) split only appears transiently inside fused
reshape-reduce/broadcast ops, never as the layout of a materialised array.
Edge weights are ``(B, H, W, G, E)`` (E small); edge-indexed signals are
tuples of E NHWC arrays.

Everything reduces to `shift2d` + elementwise math + tiny grouped
reductions, so a jitted caller gets one fused XLA stencil pipeline;
`ops.pallas` provides hand-fused kernels for the hottest compositions.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp

from irdu_tpu.ops.shifts import shift2d

Deltas = Sequence[tuple[int, int]]

# torch.nn.functional.normalize eps (reference v1x0.py:149).
_NORMALIZE_EPS = 1e-12


def _split_gf(x: jnp.ndarray, n_graphs: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H,W,G,F) view (transient, fused by XLA)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w, n_graphs, c // n_graphs)


def mul_edge_weight(x: jnp.ndarray, weights: jnp.ndarray, e: int,
                    n_graphs: int) -> jnp.ndarray:
    """Per-graph scale of a flat-channel signal by edge weight e:
    out[..., g·F+f] = x[..., g·F+f] · w[..., g, e]."""
    b, h, w, c = x.shape
    xg = _split_gf(x, n_graphs) * weights[..., e, None]
    return xg.reshape(b, h, w, c)


def per_graph_scale(x: jnp.ndarray, vec_g: jnp.ndarray) -> jnp.ndarray:
    """Multiply (B,H,W,C) by a per-graph vector (G,) broadcast over F."""
    g = vec_g.shape[0]
    b, h, w, c = x.shape
    xg = _split_gf(x, g) * vec_g[:, None]
    return xg.reshape(b, h, w, c)


def normalize_features(feats: jnp.ndarray, multi_m: jnp.ndarray,
                       n_graphs: int) -> jnp.ndarray:
    """L2-normalize node features within each graph's F-block, then scale
    by the learned per-(graph, feature) metric diagonal.

    feats: (B,H,W,C); multi_m: (G, F).
    Matches reference `normalize_and_transform_features` (v1x0.py:146-157):
    ``x / max(||x||₂, 1e-12) · diag(M)``.
    """
    b, h, w, c = feats.shape
    fg = _split_gf(feats, n_graphs)
    norm = jnp.sqrt(jnp.sum(fg * fg, axis=-1, keepdims=True))
    fg = fg / jnp.maximum(norm, _NORMALIZE_EPS)
    return (fg * multi_m).reshape(b, h, w, c)


def extract_edge_weights(
    feats: jnp.ndarray,
    multi_m: jnp.ndarray,
    deltas: Deltas,
    n_graphs: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel row-stochastic edge weights.

    feats: (B,H,W,C). Returns (weights (B,H,W,G,E), degree (B,H,W,G)).

    Semantics (reference `extract_edge_weights`, v1x0.py:160-175): both
    endpoints are normalized+metric-scaled, similarity is their dot over F
    (neighbour features gathered with replicate padding), softmax over the
    edge axis. The degree is the softmax row sum — identically 1, kept for
    API parity with the reference (which also computes-and-ignores it).
    """
    t = normalize_features(feats, multi_m, n_graphs)
    tg = _split_gf(t, n_graphs)
    sims = [
        jnp.sum(tg * _split_gf(shift2d(t, dh, dw), n_graphs), axis=-1)
        for dh, dw in deltas
    ]
    sim = jnp.stack(sims, axis=-1)  # (B,H,W,G,E)
    weights = jax.nn.softmax(sim, axis=-1)
    degree = jnp.sum(weights, axis=-1)
    return weights, degree


def op_l_norm(x: jnp.ndarray, weights: jnp.ndarray, deltas: Deltas,
              n_graphs: int) -> jnp.ndarray:
    """Random-walk normalized Laplacian matvec: ``x − Σ_e w_e ⊙ shift_e(x)``.

    x: (B,H,W,C); weights: (B,H,W,G,E). Matches reference `op_L_norm`
    (v1x0.py:218-228) including replicate-pad neighbour reads.
    """
    acc = None
    for e, (dh, dw) in enumerate(deltas):
        term = mul_edge_weight(shift2d(x, dh, dw), weights, e, n_graphs)
        acc = term if acc is None else acc + term
    return x - acc


def stats_conv(x: jnp.ndarray, stats: Mapping[str, jnp.ndarray] | None,
               pad_mode: str = "edge") -> jnp.ndarray:
    """Learned polynomial 3×3 stencil (the "generalized"/order part of
    GGLR/GGTV): identity + ∂x + ∂y + 4-point Laplacian stencils, each
    scaled by a learned coefficient; replicate-pad boundary.

    stats: dict with p01, p02a, p02b, p03 — each broadcastable to (C,)
    (per-channel in the flagship, scalar in the v5–v8 family). ``None``
    means the stencil is disabled (the *_no_orders ablations): identity.

    Matches reference `stats_conv` (v1x0.py:177-195): a grouped conv with
    kernel  p01·δ + p02a·[−1,1]ₓ + p02b·[−1,1]ᵧ + p03·(4δ−N−S−E−W),
    here expressed as clamped shifts so it fuses with the rest of the
    stencil pipeline instead of dispatching a depthwise conv.

    pad_mode: "edge" (replicate — v13/flagship) or "reflect" (the v5–v8
    family, model_GLR_GTV_deep_v6.py:456).
    """
    if stats is None:
        return x
    r = shift2d(x, 0, 1, mode=pad_mode)
    d = shift2d(x, 1, 0, mode=pad_mode)
    u = shift2d(x, -1, 0, mode=pad_mode)
    l = shift2d(x, 0, -1, mode=pad_mode)
    return (
        stats["p01"] * x
        + stats["p02a"] * (r - x)
        + stats["p02b"] * (d - x)
        + stats["p03"] * (4.0 * x - u - d - l - r)
    )


def stats_conv_transpose(x: jnp.ndarray, stats: Mapping[str, jnp.ndarray] | None) -> jnp.ndarray:
    """Adjoint of `stats_conv` *as the reference computes it*: a stride-1
    conv_transpose2d with padding=1 — i.e. correlation with the flipped
    stencils under ZERO padding (not replicate; the two are adjoint only in
    the interior). Matches reference `stats_conv_transpose` (v1x0.py:197-215).
    """
    if stats is None:
        return x
    r0 = shift2d(x, 0, 1, mode="zero")
    d0 = shift2d(x, 1, 0, mode="zero")
    u0 = shift2d(x, -1, 0, mode="zero")
    l0 = shift2d(x, 0, -1, mode="zero")
    return (
        stats["p01"] * x
        + stats["p02a"] * (l0 - x)
        + stats["p02b"] * (u0 - x)
        + stats["p03"] * (4.0 * x - u0 - d0 - l0 - r0)
    )


def glr_apply(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    deltas: Deltas,
    n_graphs: int,
    stats: Mapping[str, jnp.ndarray] | None,
    stats_pad_mode: str = "edge",
) -> jnp.ndarray:
    """GGLR operator: ``stats_convᵀ ∘ L ∘ stats_conv`` (reference
    `GLRFast.forward`, v1x0.py:231-237)."""
    y = stats_conv(x, stats, stats_pad_mode)
    y = op_l_norm(y, weights, deltas, n_graphs)
    return stats_conv_transpose(y, stats)


def op_c(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    deltas: Deltas,
    n_graphs: int,
    stats: Mapping[str, jnp.ndarray] | None,
    stats_pad_mode: str = "edge",
) -> tuple[jnp.ndarray, ...]:
    """Graph gradient: per-edge ``w_e · (x_i − x_j)`` after the stencil conv.

    Returns a tuple of E arrays (B,H,W,C). Matches reference `op_C`
    (v1x0.py:452-467) — the stencil conv is applied inside, neighbours read
    with replicate padding.
    """
    xs = stats_conv(x, stats, stats_pad_mode)
    return tuple(
        mul_edge_weight(xs - shift2d(xs, dh, dw), weights, e, n_graphs)
        for e, (dh, dw) in enumerate(deltas)
    )


def op_c_transpose(
    edge_signals: Sequence[jnp.ndarray],
    weights: jnp.ndarray,
    deltas: Deltas,
    n_graphs: int,
    stats: Mapping[str, jnp.ndarray] | None,
) -> jnp.ndarray:
    """Graph divergence Cᵀε, the adjoint scatter of `op_c`.

    edge_signals: tuple of E arrays (B,H,W,C); weights: (B,H,W,G,E).

    The reference (v1x0.py:469-516) computes this with replicate-pad +
    in-place shifted-slice subtraction + crop. That sequence is exactly
        Σ_e w_e·ε_e  −  Σ_e shift_{−δ_e}^{zero}(w_e·ε_e)
    (the pad margin only buffers writes that the crop then discards, so the
    scatter's boundary semantics are zero-fill), followed by the transposed
    stencil conv. We implement that pure form.
    """
    acc = None
    for e, (dh, dw) in enumerate(deltas):
        we = mul_edge_weight(edge_signals[e], weights, e, n_graphs)
        term = we - shift2d(we, -dh, -dw, mode="zero")
        acc = term if acc is None else acc + term
    return stats_conv_transpose(acc, stats)


def gtv_apply(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    deltas: Deltas,
    n_graphs: int,
    stats: Mapping[str, jnp.ndarray] | None,
    stats_pad_mode: str = "edge",
) -> jnp.ndarray:
    """GGTV operator ``CᵀC`` (reference `GTVFast.forward`, v1x0.py:518-523)."""
    eps = op_c(x, weights, deltas, n_graphs, stats, stats_pad_mode)
    return op_c_transpose(eps, weights, deltas, n_graphs, stats)


# ---------------------------------------------------------------------------
# Flat-channel (lane-aligned) formulation
#
# The (B,H,W,G,E) weight layout above is faithful to the reference API but
# TPU-hostile in hot loops: G and E land on the minor (lane) axis where they
# occupy a handful of the 128 lanes, and every consumer re-splits channels
# into (G, F). The flat formulation keeps ALL hot arrays at (B, H, W, C):
# edge weights are returned as a tuple of E arrays already repeated over F,
# so every downstream op is a pure lane-aligned elementwise multiply/shift.
# Measured on v5e: GLR 2.7x, GTV 1.8x over the grouped layout (PERF.md r2).
# Semantics are identical (same reference, v1x0.py:146-237, 452-523).
# ---------------------------------------------------------------------------

FlatWeights = tuple  # tuple of E arrays (B, H, W, C)


def extract_edge_weights_flat(
    feats: jnp.ndarray,
    multi_m: jnp.ndarray,
    deltas: Deltas,
    n_graphs: int,
) -> FlatWeights:
    """`extract_edge_weights` in flat form: returns a tuple of E arrays
    (B,H,W,C) — the softmaxed per-(pixel, graph) weights repeated over the
    F node features so they multiply flat-channel signals directly."""
    b, h, w, c = feats.shape
    f = c // n_graphs
    fg = _split_gf(feats, n_graphs)
    norm = jnp.sqrt(jnp.sum(fg * fg, axis=-1, keepdims=True))
    t = ((fg / jnp.maximum(norm, _NORMALIZE_EPS)) * multi_m).reshape(b, h, w, c)
    sims = []
    for dh, dw in deltas:
        prod = t * shift2d(t, dh, dw)
        sims.append(jnp.sum(prod.reshape(b, h, w, n_graphs, f), axis=-1))
    mx = sims[0]
    for s in sims[1:]:
        mx = jnp.maximum(mx, s)
    exps = [jnp.exp(s - mx) for s in sims]
    den = sum(exps)
    return tuple(jnp.repeat(e / den, f, axis=-1) for e in exps)


def extract_edge_weights_packed(
    feats: jnp.ndarray,
    multi_m: jnp.ndarray,
    deltas: Deltas,
    n_graphs: int,
) -> jnp.ndarray:
    """`extract_edge_weights` packed for the NHWC lane-packed kernels
    (ops/pallas/pixel_nhwc.py): ONE (B,H,W,E·G) array of the softmaxed
    per-(pixel, graph) weights, edge-major on lanes, NOT repeated over the
    F node features — the kernels broadcast per edge with a static
    lane-tile, so HBM carries 1/F of the flat form's weight bytes."""
    b, h, w, c = feats.shape
    f = c // n_graphs
    fg = _split_gf(feats, n_graphs)
    norm = jnp.sqrt(jnp.sum(fg * fg, axis=-1, keepdims=True))
    t = ((fg / jnp.maximum(norm, _NORMALIZE_EPS)) * multi_m).reshape(b, h, w, c)
    sims = []
    for dh, dw in deltas:
        prod = t * shift2d(t, dh, dw)
        sims.append(jnp.sum(prod.reshape(b, h, w, n_graphs, f), axis=-1))
    mx = sims[0]
    for s in sims[1:]:
        mx = jnp.maximum(mx, s)
    exps = [jnp.exp(s - mx) for s in sims]
    den = sum(exps)
    return jnp.concatenate([e / den for e in exps], axis=-1)


def op_l_norm_flat(x: jnp.ndarray, wf: FlatWeights, deltas: Deltas) -> jnp.ndarray:
    """Flat `op_l_norm`: x − Σ_e w_e ⊙ shift_e(x)."""
    acc = None
    for e, (dh, dw) in enumerate(deltas):
        term = wf[e] * shift2d(x, dh, dw)
        acc = term if acc is None else acc + term
    return x - acc


def glr_apply_flat(x, wf, deltas, stats, stats_pad_mode: str = "edge"):
    """Flat `glr_apply`: stats_convᵀ ∘ L ∘ stats_conv."""
    y = stats_conv(x, stats, stats_pad_mode)
    y = op_l_norm_flat(y, wf, deltas)
    return stats_conv_transpose(y, stats)


def op_c_flat(x, wf, deltas, stats, stats_pad_mode: str = "edge"):
    """Flat `op_c`: tuple of E arrays w_e·(x̃ − shift_e x̃)."""
    xs = stats_conv(x, stats, stats_pad_mode)
    return tuple(
        wf[e] * (xs - shift2d(xs, dh, dw))
        for e, (dh, dw) in enumerate(deltas)
    )


def op_c_transpose_flat(edge_signals, wf, deltas, stats):
    """Flat `op_c_transpose` (same zero-boundary scatter semantics)."""
    acc = None
    for e, (dh, dw) in enumerate(deltas):
        we = wf[e] * edge_signals[e]
        term = we - shift2d(we, -dh, -dw, mode="zero")
        acc = term if acc is None else acc + term
    return stats_conv_transpose(acc, stats)


def gtv_apply_flat(x, wf, deltas, stats, stats_pad_mode: str = "edge"):
    """Flat `gtv_apply` = CᵀC."""
    eps = op_c_flat(x, wf, deltas, stats, stats_pad_mode)
    return op_c_transpose_flat(eps, wf, deltas, stats)


def repeat_per_graph(vec_g: jnp.ndarray, n_node_fts: int) -> jnp.ndarray:
    """(G,) per-graph parameter -> (C,) per-channel vector for flat ops."""
    return jnp.repeat(vec_g, n_node_fts)


def soft_threshold(delta: jnp.ndarray, gamma_c: jnp.ndarray) -> jnp.ndarray:
    """Edge-domain soft shrinkage S_γ (reference `soft_threshold`,
    v1x0.py:684-704). delta: (B,H,W,C); gamma_c: per-channel threshold
    (a per-graph value repeated over F — use `jnp.repeat(gamma, F)`)."""
    return (
        jnp.where(delta < -gamma_c, delta + gamma_c, 0.0)
        + jnp.where(delta > gamma_c, delta - gamma_c, 0.0)
    )
