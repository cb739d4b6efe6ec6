"""Microbenchmark: LocalNonLinearBlock strategies at flagship scale-0 shape.

Strategies:
  xla_orig   — norm -> 1x1 expand -> depthwise 3x3 -> gate -> 1x1 project
  xla_dense  — norm -> dense 3x3 conv (dwk folded into expand) -> gate -> 1x1
  pallas_v1  — current fused kernel (ops/pallas/gated_block.py)

Methodology: data-dependent chaining (z = f(z, params) N times inside one
jit'd scan) + host readback, per PERF.md.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.ops.pallas.gated_block import fused_gated_block


def make_params(c, hidden2, dtype):
    rng = np.random.RandomState(0)
    p = dict(
        scale=rng.randn(c).astype(np.float32) * 0.1 + 1.0,
        w1=rng.randn(c, hidden2).astype(np.float32) * (1.0 / np.sqrt(c)),
        dwk=rng.randn(3, 3, hidden2).astype(np.float32) * 0.2,
        w2=rng.randn(hidden2 // 2, c).astype(np.float32) * (1.0 / np.sqrt(hidden2 // 2)),
        skip=np.array([1.0, 1.0], np.float32),
    )
    return {k: jnp.asarray(v, dtype) for k, v in p.items()}


def xla_orig(x, p):
    c = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / (c - 1)
    y0 = x / jnp.sqrt(var + 1e-5) * p["scale"]
    y1 = jnp.einsum("...i,io->...o", y0, p["w1"])
    y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    acc = sum(
        y1p[:, a:a + x.shape[1], b:b + x.shape[2], :] * p["dwk"][a, b]
        for a in range(3) for b in range(3)
    )
    m, u = jnp.split(acc, 2, axis=-1)
    y3 = jax.nn.sigmoid(m) * m * u
    y4 = jnp.einsum("...i,io->...o", y3, p["w2"])
    return p["skip"][0] * x + p["skip"][1] * y4


def xla_dense(x, p):
    c = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / (c - 1)
    y0 = x / jnp.sqrt(var + 1e-5) * p["scale"]
    # K[a,b,i,o] = w1[i,o] * dwk[a,b,o]
    k = jnp.einsum("io,abo->abio", p["w1"], p["dwk"])
    y0p = jnp.pad(y0, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    acc = jax.lax.conv_general_dilated(
        y0p, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    m, u = jnp.split(acc, 2, axis=-1)
    y3 = jax.nn.sigmoid(m) * m * u
    y4 = jnp.einsum("...i,io->...o", y3, p["w2"])
    return p["skip"][0] * x + p["skip"][1] * y4


def pallas_v1(x, p):
    return fused_gated_block(x, p["scale"], p["w1"], p["dwk"], p["w2"], p["skip"])


def bench(fn, x, p, n=50):
    @jax.jit
    def chain(x, p):
        def body(z, _):
            return fn(z, p), None
        z, _ = jax.lax.scan(body, x, None, length=n)
        return z

    chain(x, p).block_until_ready()
    float(jnp.mean(chain(x, p).astype(jnp.float32)))  # warm incl. readback
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(chain(x, p).astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    for (h, w, c, hidden2, tag) in [
        (512, 512, 48, 192, "scale0"),
        (256, 256, 96, 384, "scale1"),
        (128, 128, 192, 768, "scale2"),
        (64, 64, 384, 1536, "scale3"),
    ]:
        dtype = jnp.bfloat16
        x = jnp.asarray(np.random.RandomState(1).rand(1, h, w, c), dtype)
        p = make_params(c, hidden2, dtype)
        r_orig = bench(xla_orig, x, p)
        r_dense = bench(xla_dense, x, p)
        try:
            r_pl = bench(pallas_v1, x, p)
        except Exception as e:
            r_pl = float("nan")
            print("pallas failed:", repr(e)[:200])
        print(f"{tag} ({h}x{w}x{c}): xla_orig {r_orig*1e3:.3f} ms  "
              f"xla_dense {r_dense*1e3:.3f} ms  pallas_v1 {r_pl*1e3:.3f} ms")
        # numerics check
        d = float(jnp.max(jnp.abs(xla_orig(x, p).astype(jnp.float32)
                                  - xla_dense(x, p).astype(jnp.float32))))
        print(f"  |orig - dense|_max = {d:.2e}")


if __name__ == "__main__":
    main()
