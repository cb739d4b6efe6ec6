"""Solver dissection: time each phase of MixtureGTVGLR at scale0, and
compare the current (B,H,W,G,E)-weight formulation against a flat-channel
one (per-edge (B,H,W,C) arrays, weights pre-repeated over F) that keeps
every hot op lane-aligned.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.ops.graph import (
    extract_edge_weights, glr_apply, gtv_apply, per_graph_scale,
)
from irdu_tpu.ops.shifts import shift2d
from irdu_tpu.ops.windows import WINDOWS

DELTAS = WINDOWS["cross4"]


def bench(fn, *args, n0=5, n1=35):
    """Marginal per-iteration cost via paired scan lengths (removes the
    ~27ms fixed per-call tunnel overhead)."""
    def make(n):
        @jax.jit
        def chain(*a):
            def body(c, _):
                out = fn(*((c,) + a[1:]))
                if isinstance(out, tuple):
                    out = sum(out)
                if out.shape != c.shape:
                    out = jnp.broadcast_to(jnp.mean(out), c.shape) + c * 0.99
                return out.astype(c.dtype), None
            z, _ = jax.lax.scan(body, a[0], None, length=n)
            return z
        return chain
    ts = []
    for chain in (make(n0), make(n1)):
        chain(*args).block_until_ready()
        float(jnp.mean(chain(*args).astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.mean(chain(*args).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (n1 - n0)


# ---------------- flat-channel formulation ----------------

def repeat_g_to_c(w_g, f):
    """(B,H,W,G) -> (B,H,W,G*f) channel-repeated."""
    return jnp.repeat(w_g, f, axis=-1)


def extract_edge_weights_flat(feats, multi_m, deltas, n_graphs):
    """Returns tuple of E arrays (B,H,W,C): softmaxed sims repeated over F."""
    b, h, w, c = feats.shape
    f = c // n_graphs
    fg = feats.reshape(b, h, w, n_graphs, f)
    norm = jnp.sqrt(jnp.sum(fg * fg, axis=-1, keepdims=True))
    t = (fg / jnp.maximum(norm, 1e-12) * multi_m).reshape(b, h, w, c)
    # per-edge similarity: elementwise mul (C lanes) then F-block reduce
    sims = []
    for dh, dw in deltas:
        prod = t * shift2d(t, dh, dw)
        sims.append(jnp.sum(prod.reshape(b, h, w, n_graphs, f), axis=-1))
    # softmax across E (tuple-wise, C-free)
    mx = sims[0]
    for s in sims[1:]:
        mx = jnp.maximum(mx, s)
    exps = [jnp.exp(s - mx) for s in sims]
    den = sum(exps)
    return tuple(repeat_g_to_c(e / den, f) for e in exps)


def stats_conv_flat(x, stats, pad_mode="edge"):
    r = shift2d(x, 0, 1, mode=pad_mode)
    d = shift2d(x, 1, 0, mode=pad_mode)
    u = shift2d(x, -1, 0, mode=pad_mode)
    l = shift2d(x, 0, -1, mode=pad_mode)
    return (stats["p01"] * x + stats["p02a"] * (r - x)
            + stats["p02b"] * (d - x) + stats["p03"] * (4.0 * x - u - d - l - r))


def stats_conv_T_flat(x, stats):
    r0 = shift2d(x, 0, 1, mode="zero")
    d0 = shift2d(x, 1, 0, mode="zero")
    u0 = shift2d(x, -1, 0, mode="zero")
    l0 = shift2d(x, 0, -1, mode="zero")
    return (stats["p01"] * x + stats["p02a"] * (l0 - x)
            + stats["p02b"] * (u0 - x) + stats["p03"] * (4.0 * x - u0 - d0 - l0 - r0))


def glr_flat(x, wf, stats):
    y = stats_conv_flat(x, stats)
    acc = None
    for e, (dh, dw) in enumerate(DELTAS):
        term = wf[e] * shift2d(y, dh, dw)
        acc = term if acc is None else acc + term
    return stats_conv_T_flat(y - acc, stats)


def gtv_flat(x, wf, stats):
    xs = stats_conv_flat(x, stats)
    acc = None
    for e, (dh, dw) in enumerate(DELTAS):
        we = wf[e] * (xs - shift2d(xs, dh, dw))
        term = we - shift2d(we, -dh, -dw, mode="zero")
        acc = term if acc is None else acc + term
    return stats_conv_T_flat(acc, stats)


def main():
    h = w = 512
    g, c = 8, 48
    f = c // g
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, h, w, c), dt)
    feats = jnp.asarray(rng.rand(1, h, w, c), dt)
    multi_m = jnp.asarray(rng.rand(g, f), dt)
    stats = {k: jnp.asarray(rng.rand(c) * 0.1, dt)
             for k in ("p01", "p02a", "p02b", "p03")}
    mu = jnp.asarray(rng.rand(g), dt)
    mu_c = jnp.repeat(mu, f)

    # current formulation
    weights, _ = jax.jit(lambda ft: extract_edge_weights(ft, multi_m, DELTAS, g))(feats)
    t_ew = bench(lambda ft: extract_edge_weights(ft, multi_m, DELTAS, g)[0], feats)
    t_glr = bench(lambda z: per_graph_scale(glr_apply(z, weights, DELTAS, g, stats), mu),
                  x)
    t_gtv = bench(lambda z: per_graph_scale(gtv_apply(z, weights, DELTAS, g, stats), mu),
                  x)
    t_mv = bench(
        lambda z: z
        + per_graph_scale(glr_apply(z, weights, DELTAS, g, stats), mu)
        + per_graph_scale(gtv_apply(z, weights, DELTAS, g, stats), mu),
        x)
    print(f"current: extract {t_ew*1e3:.3f}  glr {t_glr*1e3:.3f}  "
          f"gtv {t_gtv*1e3:.3f}  matvec(full-res part) {t_mv*1e3:.3f} ms")

    # flat formulation
    wf = jax.jit(lambda ft: extract_edge_weights_flat(ft, multi_m, DELTAS, g))(feats)
    t_ewf = bench(lambda ft: extract_edge_weights_flat(ft, multi_m, DELTAS, g)[0], feats)
    t_glrf = bench(lambda z: mu_c * glr_flat(z, wf, stats), x)
    t_gtvf = bench(lambda z: mu_c * gtv_flat(z, wf, stats), x)
    t_mvf = bench(lambda z: z + mu_c * glr_flat(z, wf, stats)
                  + mu_c * gtv_flat(z, wf, stats), x)
    print(f"flat:    extract {t_ewf*1e3:.3f}  glr {t_glrf*1e3:.3f}  "
          f"gtv {t_gtvf*1e3:.3f}  matvec(full-res part) {t_mvf*1e3:.3f} ms")

    # numerics agreement
    a = per_graph_scale(glr_apply(x, weights, DELTAS, g, stats), mu)
    b = mu_c * glr_flat(x, wf, stats)
    print(f"glr |cur-flat|max = {float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))):.2e}")


if __name__ == "__main__":
    main()
