"""Marginal cost of the CHW path's XLA glue: box down/up, transposes,
band gathers, edge-weight kernel."""
from __future__ import annotations
import time
import jax, jax.numpy as jnp, numpy as np
import irdu_tpu.ops.pallas.solver_chw as sc


def marginal(fn, x, n0=10, n1=60):
    def t_at(n):
        @jax.jit
        def chain(a):
            def bd(c, _):
                o = fn(c)
                return jnp.broadcast_to(o, c.shape).astype(c.dtype) if o.shape != c.shape else o, None
            z, _ = jax.lax.scan(bd, a, None, length=n)
            return z
        chain(x).block_until_ready()
        float(jnp.mean(chain(x).astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.mean(chain(x).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t_at(n1) - t_at(n0)) / (n1 - n0)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 48, 512, 512), jnp.bfloat16)

    t = marginal(lambda z: sc.box_up_chw(sc.box_down_chw(z)), x)
    print(f"box down+up chw (48,512,512): {t*1e3:.3f} ms", flush=True)

    t = marginal(lambda z: jnp.transpose(jnp.transpose(z, (0, 2, 3, 1)), (0, 3, 1, 2)), x)
    print(f"transpose chw->hwc->chw: {t*1e3:.3f} ms", flush=True)

    t = marginal(lambda z: sc._gather_bands(
        z.reshape(1, 8, 6, 512, 512), 64, 4).reshape(1, 8, 6, -1, 512)[:, :, :, :512].reshape(z.shape), x)
    print(f"gather bands x (halo4): {t*1e3:.3f} ms", flush=True)

    feats = jnp.asarray(rng.rand(1, 48, 512, 512), jnp.bfloat16)
    mm = jnp.asarray(rng.rand(8, 6) + 0.5, jnp.float32)
    def ewf(z):
        o = sc.edge_weights_chw(z, mm, n_graphs=8, true_h=512, true_w=512)
        return o.reshape(1, 32, 512, 512)[:, :1]
    t = marginal(ewf, feats)
    print(f"edge_weights kernel: {t*1e3:.3f} ms", flush=True)

    # axpy pass in CHW
    a = jnp.asarray(rng.rand(1, 48, 1, 1), jnp.bfloat16)
    t = marginal(lambda z: z + a * (z * 1.01), x)
    print(f"axpy chw pass: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
