"""Graph stencil operators (L1 core).

Re-expresses the reference's graph-operator machinery
(`GLRFast`/`GTVFast`, /root/reference/exploration/GGTV_GGLR_v1.0/
deep_multiscale_GGLR_GGTV_v1x0.py:13-523) as pure, fusible jnp functions:

  * per-pixel learned edge weights via feature similarity + softmax
  * random-walk graph Laplacian matvec  L x = x − W·x_nbr
  * graph gradient C / divergence Cᵀ (the GTV split operators)
  * the "generalized" polynomial stencil conv (stats_conv) and its adjoint

Layout: grouped-NHWC ``(B, H, W, G, F)`` — G graphs, F node features.
Edge-indexed tensors are stacked edge-major: ``(E, B, H, W, G, F)``.
Edge weights: ``(B, H, W, G, E)``.

Everything reduces to `shift2d` + elementwise math + tiny reductions, so a
jitted caller gets one fused XLA stencil pipeline; `ops.pallas` provides
hand-fused kernels for the hottest compositions.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp

from irdu_tpu.ops.shifts import shift2d

Deltas = Sequence[tuple[int, int]]

# torch.nn.functional.normalize eps (reference v1x0.py:149).
_NORMALIZE_EPS = 1e-12


def normalize_features(feats: jnp.ndarray, multi_m: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize node features over F, then scale by the learned
    per-(graph, feature) metric diagonal.

    feats: (B, H, W, G, F); multi_m: (G, F).
    Matches reference `normalize_and_transform_features` (v1x0.py:146-157):
    ``x / max(||x||₂, 1e-12) · diag(M)``.
    """
    norm = jnp.sqrt(jnp.sum(feats * feats, axis=-1, keepdims=True))
    feats = feats / jnp.maximum(norm, _NORMALIZE_EPS)
    return feats * multi_m


def extract_edge_weights(
    feats: jnp.ndarray,
    multi_m: jnp.ndarray,
    deltas: Deltas,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel row-stochastic edge weights.

    Returns (weights (B,H,W,G,E), degree (B,H,W,G)).

    Semantics (reference `extract_edge_weights`, v1x0.py:160-175): both
    endpoints are normalized+metric-scaled, similarity is their dot over F
    (neighbour features gathered with replicate padding), softmax over the
    edge axis. The degree is the softmax row sum — identically 1, kept for
    API parity with the reference (which also computes-and-ignores it).
    """
    t = normalize_features(feats, multi_m)
    sims = [jnp.sum(t * shift2d(t, dh, dw), axis=-1) for dh, dw in deltas]
    sim = jnp.stack(sims, axis=-1)  # (B,H,W,G,E)
    weights = jax.nn.softmax(sim, axis=-1)
    degree = jnp.sum(weights, axis=-1)
    return weights, degree


def op_l_norm(x: jnp.ndarray, weights: jnp.ndarray, deltas: Deltas) -> jnp.ndarray:
    """Random-walk normalized Laplacian matvec: ``x − Σ_e w_e ⊙ shift_e(x)``.

    x: (B,H,W,G,F); weights: (B,H,W,G,E). Matches reference `op_L_norm`
    (v1x0.py:218-228) including replicate-pad neighbour reads.
    """
    wx = x  # accumulate x - sum as x + sum(-...)
    acc = None
    for e, (dh, dw) in enumerate(deltas):
        term = weights[..., e, None] * shift2d(x, dh, dw)
        acc = term if acc is None else acc + term
    return wx - acc


def stats_conv(x: jnp.ndarray, stats: Mapping[str, jnp.ndarray] | None) -> jnp.ndarray:
    """Learned polynomial 3×3 stencil (the "generalized"/order part of
    GGLR/GGTV): identity + ∂x + ∂y + 4-point Laplacian stencils, each
    scaled by a learned coefficient; replicate-pad boundary.

    stats: dict with p01, p02a, p02b, p03 — each broadcastable to (G, F)
    (per-channel in the flagship, scalar in the v5–v8 family). ``None``
    means the stencil is disabled (the *_no_orders ablations): identity.

    Matches reference `stats_conv` (v1x0.py:177-195): a grouped conv with
    kernel  p01·δ + p02a·[−1,1]ₓ + p02b·[−1,1]ᵧ + p03·(4δ−N−S−E−W),
    here expressed as clamped shifts so it fuses with the rest of the
    stencil pipeline instead of dispatching a depthwise conv.
    """
    if stats is None:
        return x
    r = shift2d(x, 0, 1)
    d = shift2d(x, 1, 0)
    u = shift2d(x, -1, 0)
    l = shift2d(x, 0, -1)
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
    stats: Mapping[str, jnp.ndarray] | None,
) -> jnp.ndarray:
    """GGLR operator: ``stats_convᵀ ∘ L ∘ stats_conv`` (reference
    `GLRFast.forward`, v1x0.py:231-237)."""
    y = stats_conv(x, stats)
    y = op_l_norm(y, weights, deltas)
    return stats_conv_transpose(y, stats)


def op_c(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    deltas: Deltas,
    stats: Mapping[str, jnp.ndarray] | None,
) -> jnp.ndarray:
    """Graph gradient: per-edge ``w_e · (x_i − x_j)`` after the stencil conv.

    Returns edge signals (E, B, H, W, G, F). Matches reference `op_C`
    (v1x0.py:452-467) — the stencil conv is applied inside, neighbours read
    with replicate padding.
    """
    xs = stats_conv(x, stats)
    out = [
        weights[..., e, None] * (xs - shift2d(xs, dh, dw))
        for e, (dh, dw) in enumerate(deltas)
    ]
    return jnp.stack(out, axis=0)


def op_c_transpose(
    edge_signals: jnp.ndarray,
    weights: jnp.ndarray,
    deltas: Deltas,
    stats: Mapping[str, jnp.ndarray] | None,
) -> jnp.ndarray:
    """Graph divergence Cᵀε, the adjoint scatter of `op_c`.

    edge_signals: (E, B, H, W, G, F); weights: (B, H, W, G, E).

    The reference (v1x0.py:469-516) computes this with replicate-pad +
    in-place shifted-slice subtraction + crop. That sequence is exactly
        Σ_e w_e·ε_e  −  Σ_e shift_{−δ_e}^{zero}(w_e·ε_e)
    (the pad margin only buffers writes that the crop then discards, so the
    scatter's boundary semantics are zero-fill), followed by the transposed
    stencil conv. We implement that pure form.
    """
    acc = None
    for e, (dh, dw) in enumerate(deltas):
        we = weights[..., e, None] * edge_signals[e]
        term = we - shift2d(we, -dh, -dw, mode="zero")
        acc = term if acc is None else acc + term
    return stats_conv_transpose(acc, stats)


def gtv_apply(
    x: jnp.ndarray,
    weights: jnp.ndarray,
    deltas: Deltas,
    stats: Mapping[str, jnp.ndarray] | None,
) -> jnp.ndarray:
    """GGTV operator ``CᵀC`` (reference `GTVFast.forward`, v1x0.py:518-523)."""
    eps = op_c(x, weights, deltas, stats)
    return op_c_transpose(eps, weights, deltas, stats)


def soft_threshold(delta: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """Edge-domain soft shrinkage S_γ (reference `soft_threshold`,
    v1x0.py:684-704). delta: (E,B,H,W,G,F); gamma: (G,) per-graph threshold,
    broadcast over edges/features."""
    g = gamma[None, None, None, None, :, None]
    return jnp.where(delta < -g, delta + g, 0.0) + jnp.where(delta > g, delta - g, 0.0)
