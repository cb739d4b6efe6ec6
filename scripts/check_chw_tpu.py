"""On-TPU: flagship forward with/without the CHW solver path — numeric
agreement + marginal timing."""
from __future__ import annotations
import time
import jax, jax.numpy as jnp, numpy as np
from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config


def marginal(fn, x, n0=3, n1=13, reps=3):
    def make(n):
        @jax.jit
        def chain(x):
            def bd(c, _):
                return fn(c), None
            z, _ = jax.lax.scan(bd, x, None, length=n)
            return z
        return chain
    out = []
    for c in (make(n0), make(n1)):
        c(x).block_until_ready()
        float(jnp.mean(c(x).astype(jnp.float32)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.mean(c(x).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        out.append(best)
    return (out[1] - out[0]) / (n1 - n0)


def main():
    cfg = flagship_config()
    m_ref = AbstractMultiScaleGraphFilter(use_pallas_blocks=True, **cfg)
    m_chw = AbstractMultiScaleGraphFilter(use_pallas_blocks=True,
                                          use_pallas_solver=True, **cfg)
    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
    params = jax.jit(m_ref.init)(jax.random.PRNGKey(0), x32)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    x = x32.astype(jnp.bfloat16)

    a = jax.jit(m_ref.apply)(params, x)
    b = jax.jit(m_chw.apply)(params, x)
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"max |ref - chw| = {d:.4e}", flush=True)

    t_ref = marginal(lambda z: m_ref.apply(params, z), x)
    t_chw = marginal(lambda z: m_chw.apply(params, z), x)
    mp = 0.262144
    print(f"ref: {t_ref*1e3:.2f} ms ({mp/t_ref:.2f} MP/s)   "
          f"chw: {t_chw*1e3:.2f} ms ({mp/t_chw:.2f} MP/s)", flush=True)


if __name__ == "__main__":
    main()
