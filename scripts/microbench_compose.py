"""Localize the in-model overhead (dead-code-safe): every stage keeps all
outputs alive by folding a scalar reduction into the scan carry."""
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


def keepalive(x, parts):
    s = sum(jnp.mean(p.astype(jnp.float32)) for p in parts)
    return x + (s * 1e-6).astype(x.dtype)


def main():
    model = AbstractMultiScaleGraphFilter(use_pallas_blocks=True, **flagship_config())
    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x32)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    x = x32.astype(jnp.bfloat16)

    def enc(z):
        return keepalive(z, model.apply(params, z, method="encode"))
    print(f"encode(all scales): {marginal(enc, x)*1e3:.2f} ms", flush=True)

    def enc_filt(z):
        codes = model.apply(params, z, method="encode")
        return keepalive(z, model.apply(params, codes, method="filtering"))
    print(f"encode+filtering: {marginal(enc_filt, x)*1e3:.2f} ms", flush=True)

    t_ae = marginal(lambda z: model.apply(params, z, method="enc_dec"), x)
    print(f"enc_dec: {t_ae*1e3:.2f} ms", flush=True)

    t_full = marginal(lambda z: model.apply(params, z), x)
    print(f"full: {t_full*1e3:.2f} ms", flush=True)

    # full with optimization_barrier between stages
    def full_cut(z):
        codes = model.apply(params, z, method="encode")
        codes = jax.lax.optimization_barrier(codes)
        f = model.apply(params, codes, method="filtering")
        f = jax.lax.optimization_barrier(f)
        return model.apply(params, f, method="decode")
    print(f"full with stage barriers: {marginal(full_cut, x)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
