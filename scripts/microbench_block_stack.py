"""On-chip: flat-lane CHW stacked block kernel vs NHWC per-block kernel.

Marginal methodology (PERF.md): scan-chain at two lengths, slope. The
scalar readback lives INSIDE the jit — an eager jnp.mean dispatched after
a pallas chain intermittently stalls for minutes on this rig.

Measured (v5e, bf16, tile_h=32):
  scale0 (512²×48, K=4): stack 2.61 ms vs NHWC×4 3.21 ms → 1.23×
  scale1 (256²×96, K=6): stack 2.10 ms vs NHWC×6 1.65 ms → 0.79× (skip)
→ the model stacks only dim ≤ 64 scales (flagship._run_blocks_fast).
"""
from __future__ import annotations
import time
import jax, jax.numpy as jnp, numpy as np
from irdu_tpu.ops.pallas.gated_block import fused_gated_block
from irdu_tpu.ops.pallas.block_stack import fused_block_stack, pack_block_params


def t_scan(fn, x, n, reps=3):
    @jax.jit
    def chain(x):
        def bd(c, _):
            return fn(c), None
        z, _ = jax.lax.scan(bd, x, None, length=n)
        return jnp.mean(z.astype(jnp.float32))
    t0 = time.perf_counter()
    float(chain(x))
    print(f"    compile n={n}: {time.perf_counter()-t0:.1f} s", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(x))
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(fn, x, n0=5, n1=30):
    return (t_scan(fn, x, n1) - t_scan(fn, x, n0)) / (n1 - n0)


def mk_params(rng, c, h2, k):
    return [dict(
        scale=rng.randn(c).astype(np.float32) * 0.1 + 1.0,
        w1=(rng.randn(c, h2) / np.sqrt(c)).astype(np.float32),
        dwk=(rng.randn(3, 3, h2) * 0.2).astype(np.float32),
        w2=(rng.randn(h2 // 2, c) / np.sqrt(h2 // 2)).astype(np.float32),
        skip=np.array([1.0, 0.8], np.float32)) for _ in range(k)]


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    for (H, W, c, h2, K, tag) in [
        (512, 512, 48, 192, 4, "scale0 K=4"),
        (256, 256, 96, 384, 6, "scale1 K=6"),
    ]:
        params = mk_params(rng, c, h2, K)
        packed = pack_block_params(params, dt)
        xc = jnp.asarray(rng.rand(1, c, H, W), dt)

        def stack_fn(z):
            return fused_block_stack(z, *packed)

        pn = [{k_: jnp.asarray(v, dt) for k_, v in p.items()} for p in params]

        def nhwc_fn(z):
            for p in pn:
                z = fused_gated_block(z, p["scale"], p["w1"], p["dwk"],
                                      p["w2"], p["skip"])
            return z

        xn = jnp.transpose(xc, (0, 2, 3, 1))
        print(f"{tag}: measuring stack", flush=True)
        m_stack = marginal(stack_fn, xc)
        print(f"{tag}: measuring nhwc", flush=True)
        m_nhwc = marginal(nhwc_fn, xn)
        print(f"{tag} ({H}x{W}x{c}): stack {m_stack*1e3:.3f} ms  "
              f"nhwc x K {m_nhwc*1e3:.3f} ms  ({m_nhwc/m_stack:.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
