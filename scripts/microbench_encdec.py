"""Where does enc_dec's time go?

Measures (marginal method, 512² bf16 fast path):
  * patch-embed 3×3 conv standalone;
  * per-scale encoder block stacks standalone, via the exact code path the
    model uses (_run_blocks_fast): scale0 rides the CHW flat-lane stacked
    kernel, scales 1-3 the per-block NHWC kernel.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config
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

    # patch embed standalone (NHWC 3×3 conv 3→48 at 512²); the chain
    # carries (B, H, W, 3) by re-slicing the embed output.
    x = x32.astype(jnp.bfloat16)
    t = marginal(lambda z: model.apply(
        params, z, method=lambda m, img: m.patch_3x3_embeding(img)[..., :3]),
        x)
    print(f"patch_embed (+slice): {t*1e3:6.2f} ms", flush=True)

    # per-scale encoder stacks, exact model path
    hw = [512, 256, 128, 64]
    for s in range(4):
        c = cfg["dims"][s]
        xs = jnp.asarray(rng.rand(1, c, hw[s], hw[s]).astype(np.float32)
                         ).astype(jnp.bfloat16)

        # _run_blocks_fast may return NHWC (fall-through path); normalize
        # the chain by converting back to CHW so the scan carries one shape.
        def step(z, s=s, c=c):
            out, is_chw = model.apply(
                params, z, method=lambda m, a: m._run_blocks_fast(
                    a, True, m.encoder_scales[s], c))
            if not is_chw:
                out = jnp.transpose(out, (0, 3, 1, 2))
            return out

        t = marginal(step, xs)
        n = cfg["num_blocks"][s]
        print(f"enc scale{s} ({hw[s]}²×{c}, {n} blocks): {t*1e3:6.2f} ms "
              f"({t/n*1e3:.3f} ms/blk)", flush=True)


if __name__ == "__main__":
    main()
