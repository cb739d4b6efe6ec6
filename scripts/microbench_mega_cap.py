"""Whole-unroll kernel above the 512^2 plane cap: correctness + timing.

The mega (whole-unroll) kernel holds one full (H, W) f32 plane plus the
per-graph weight planes in VMEM (ops/pallas/solver_unroll.py); the cap
`solvers.gtv_glr._MEGA_MAX_PIXELS` routes larger planes to the per-step
band kernels. 512^2 was the measured-safe bound when the kernel landed;
Kodak-scale eval images (768x512 -> scale0 plane 393k px) fall back to
the band path today. This probe asks whether the cap can be raised:

  1. correctness: mega output vs the authoritative jnp path at 768x512
     (real chip, not interpret mode — the failure mode being probed is
     Mosaic VMEM scheduling, which interpret mode cannot exercise);
  2. timing: band path vs mega path, paired-scan marginal method.

Usage: python scripts/microbench_mega_cap.py [--h 768] [--w 512]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=768)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--skip-jnp", action="store_true",
                    help="timing only (skip the jnp correctness compile)")
    args = ap.parse_args()

    import irdu_tpu.solvers.gtv_glr as G
    from irdu_tpu.models.blocks import LocalLowpassFilteringBlock

    # flagship scale0 solver configuration (models/flagship.py)
    kw = dict(dim=48, ngraphs=8)
    slow = LocalLowpassFilteringBlock(**kw)
    fast = LocalLowpassFilteringBlock(use_pallas_solver=True, **kw)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, args.h, args.w, 48), jnp.bfloat16)
    params = jax.jit(slow.init)(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    px = args.h * args.w
    cap = G._MEGA_MAX_PIXELS

    # band path (forced by lowering the cap for this process)
    G._MEGA_MAX_PIXELS = 0
    t_band = marginal(lambda z: fast.apply(params, z), x)
    print(f"band  path @ {args.h}x{args.w}: {t_band*1e3:.2f} ms")

    # mega path (the shipped cap, or raised to cover the probe target)
    G._MEGA_MAX_PIXELS = max(cap, px)
    t_mega = marginal(lambda z: fast.apply(params, z), x)
    print(f"mega  path @ {args.h}x{args.w}: {t_mega*1e3:.2f} ms")

    if not args.skip_jnp:
        @jax.jit
        def diff(p, z):
            a = slow.apply(p, z).astype(jnp.float32)
            b = fast.apply(p, z).astype(jnp.float32)
            return jnp.max(jnp.abs(a - b)), jnp.mean(jnp.abs(a - b))

        mx, mn = (float(v) for v in diff(params, x))
        print(f"mega vs jnp: max|d|={mx:.2e} mean|d|={mn:.2e}")
        assert mx < 2e-2, "mega path disagrees beyond bf16 tolerance"
    print("OK")


if __name__ == "__main__":
    main()
