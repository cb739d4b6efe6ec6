"""Marginal cost of each CHW solver kernel at scale0/scale1 shapes, with
tile_h sweep (env IRDU_TILE_H override hack via _pick_tile_h monkeypatch)."""
from __future__ import annotations
import time
import jax, jax.numpy as jnp, numpy as np
import irdu_tpu.ops.pallas.solver_chw as sc


def marginal(fn, *args, n0=10, n1=60):
    def t_at(n):
        @jax.jit
        def chain(x0, rest):
            def bd(c, _):
                return fn(c, *rest).astype(c.dtype), None
            z, _ = jax.lax.scan(bd, x0, None, length=n)
            return z
        r = (args[0], args[1:])
        chain(*r).block_until_ready()
        float(jnp.mean(chain(*r).astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.mean(chain(*r).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t_at(n1) - t_at(n0)) / (n1 - n0)


def bench_scale(h, w, c, g, tag):
    f = c // g
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, c, h, w), jnp.bfloat16)
    wg = jnp.asarray(rng.rand(1, g, 4, h, w) * 0.25, jnp.bfloat16)
    wl = jnp.asarray(rng.rand(1, g, 4, h, w) * 0.25, jnp.bfloat16)
    p = jnp.asarray(rng.rand(g, 4, f), jnp.float32)
    mu = jnp.asarray(rng.rand(g) * 0.1, jnp.float32)
    ro = jnp.asarray(rng.rand(g) * 0.1, jnp.float32)
    feats = jnp.asarray(rng.rand(1, c, h, w), jnp.bfloat16)
    mm = jnp.asarray(rng.rand(g, f) + 0.5, jnp.float32)

    for th in (64, 128, 256):
        if h % th:
            continue
        sc._pick_tile_h = lambda hh, th=th: th if hh % th == 0 else (64 if hh % 64 == 0 else 8)
        t = marginal(lambda z, wl, wg, p, mu, ro: sc.gg_matvec_chw(
            z, wl, wg, p, p, mu, ro, n_graphs=g, true_h=h, true_w=w),
            x, wl, wg, p, mu, ro)
        print(f"{tag} matvec th={th}: {t*1e3:.3f} ms", flush=True)
    sc._pick_tile_h = lambda hh: 64 if hh % 64 == 0 else 8

    t = marginal(lambda z, wg, p, mu, ro: sc.gg_matvec_chw(
        z, None, wg, None, p, mu, ro, n_graphs=g, true_h=h, true_w=w,
        with_glr=False),
        x, wg, p, mu, ro)
    print(f"{tag} matvec gtv-only: {t*1e3:.3f} ms", flush=True)

    t = marginal(lambda z, wg, p, mu, ro: sc.gtv_rethresh_chw(
        z, None, wg, p, mu, ro, n_graphs=g, true_h=h, true_w=w),
        x, wg, p, mu, ro)
    print(f"{tag} rethresh: {t*1e3:.3f} ms", flush=True)

    def ewf(z, mm):
        o = sc.edge_weights_chw(z, mm, n_graphs=g, true_h=h, true_w=w)
        o = o.reshape(1, g * 4, h, w)
        return jnp.concatenate([o, o[:, :c - g * 4]], axis=1) if g * 4 < c else o[:, :c]
    t = marginal(ewf, feats, mm)
    print(f"{tag} edge_weights: {t*1e3:.3f} ms", flush=True)


def main():
    bench_scale(512, 512, 48, 8, "scale0")
    bench_scale(256, 256, 96, 16, "scale1")


if __name__ == "__main__":
    main()
