"""Raw MXU rate check through this rig: what TFLOP/s do we get for the
matmul shapes the gated block needs, vs a big square matmul?"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_matmul(m, k, n, dtype=jnp.bfloat16, odt=jnp.bfloat16, iters=30):
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(m, k), dtype)
    b = jnp.asarray(rng.rand(k, n), dtype)

    @jax.jit
    def chain(a, b):
        def body(c, _):
            y = jax.lax.dot_general(c, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=odt)
            # feed back: shrink/expand n->k cheaply
            return y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n))), None
        z, _ = jax.lax.scan(body, a, None, length=iters)
        return z

    chain(a, b).block_until_ready()
    float(jnp.mean(chain(a, b).astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.mean(chain(a, b).astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    fl = 2 * m * k * n
    print(f"M={m} K={k} N={n} {np.dtype(dtype.dtype if hasattr(dtype,'dtype') else dtype).name}->{jnp.dtype(odt).name}: "
          f"{best*1e6:.1f} us  {fl/best/1e12:.1f} TFLOP/s")


def main():
    bench_matmul(4096, 4096, 4096)
    bench_matmul(8192, 8192, 8192, iters=10)
    bench_matmul(262144, 432, 192)   # the whole-image im2col dot
    bench_matmul(262144, 512, 192)   # K padded
    bench_matmul(262144, 48, 192)    # the expand 1x1
    bench_matmul(262144, 96, 48)     # the project 1x1
    bench_matmul(262144, 432, 384)   # wider N
    bench_matmul(65536, 864, 384)    # scale1 im2col
    bench_matmul(262144, 432, 192, odt=jnp.float32)


if __name__ == "__main__":
    main()
