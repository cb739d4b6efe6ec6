"""Frame breakdown with the fused CHW solver path (marginal method).

Measures, at 512² bf16 with use_pallas_blocks + use_pallas_solver:
  * full __call__ (the bench configuration)
  * enc_dec (filtering=False) → solver total = full − enc_dec
  * standalone per-scale MixtureGTVGLR applies at the flagship's four
    filter shapes (CHW in/out where the fast path qualifies), to
    attribute the solver total across scales.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config
from irdu_tpu.solvers.gtv_glr import MixtureGTVGLR
from irdu_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()


def marginal(fn, x, n0=3, n1=13, reps=3):
    def make(n):
        @jax.jit
        def chain(z):
            def bd(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(bd, z, None, length=n)
            return jnp.mean(out.astype(jnp.float32))
        return chain
    ts = []
    for c in (make(n0), make(n1)):
        float(c(x))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(c(x))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (n1 - n0)


def main():
    cfg = flagship_config()
    model = AbstractMultiScaleGraphFilter(
        use_pallas_blocks=True, use_pallas_solver=True, **cfg)
    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x32)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    x = x32.astype(jnp.bfloat16)

    t_full = marginal(lambda z: model.apply(params, z), x)
    print(f"full:    {t_full*1e3:6.2f} ms ({0.262144/t_full:.2f} MP/s)",
          flush=True)
    t_ae = marginal(lambda z: model.apply(params, z, method="enc_dec"), x)
    print(f"enc_dec: {t_ae*1e3:6.2f} ms -> solver total ≈ "
          f"{(t_full-t_ae)*1e3:.2f} ms", flush=True)

    # standalone per-scale filter costs (fast path qualifies at scales 0-1)
    shapes = [(512, cfg["dims"][0], cfg["ngraphs"][0]),
              (256, cfg["dims"][1], cfg["ngraphs"][1]),
              (128, cfg["dims"][2], cfg["ngraphs"][2]),
              (64, cfg["dims"][3], cfg["ngraphs"][3])]
    for s, (hw, c, g) in enumerate(shapes):
        m = MixtureGTVGLR(n_graphs=g, n_node_fts=c // g,
                          use_pallas_unroll=True)
        xs32 = jnp.asarray(rng.rand(1, hw, hw, c).astype(np.float32))
        p = jax.jit(m.init)(jax.random.PRNGKey(s), xs32)
        p = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
        xs = xs32.astype(jnp.bfloat16)
        t = marginal(lambda z: m.apply(p, z), xs)
        shape = (1, hw, hw, c)
        path = ("mega" if m._mega_ok(shape)
                else "band" if m._chw_ok(shape) else "jnp")
        print(f"scale{s} ({hw}²×{c}, G={g}, {path}): {t*1e3:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
