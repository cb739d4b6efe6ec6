"""On-TPU numeric agreement of the fast path vs the jnp path, single
dispatch each (no scan chains — the chained variant in check_chw_tpu.py
costs ~20 min of cold compiles through this rig's tunnel; a lone forward
compiles in a few minutes and answers the correctness question)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config
from irdu_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()


def main():
    cfg = flagship_config()
    slow = AbstractMultiScaleGraphFilter(**cfg)
    fast = AbstractMultiScaleGraphFilter(
        use_pallas_blocks=True, use_pallas_solver=True, **cfg)
    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
    params = jax.jit(slow.init)(jax.random.PRNGKey(0), x32)
    pbf = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    x = x32.astype(jnp.bfloat16)

    @jax.jit
    def diff(p, z):
        a = slow.apply(p, z).astype(jnp.float32)
        b = fast.apply(p, z).astype(jnp.float32)
        return jnp.max(jnp.abs(a - b)), jnp.mean(jnp.abs(a - b))

    mx, mn = diff(pbf, x)
    print(f"bf16 fast-vs-jnp: max|Δ|={float(mx):.2e} mean|Δ|={float(mn):.2e}")
    assert float(mx) < 2e-2, "fast path disagrees beyond bf16 tolerance"
    print("OK")


if __name__ == "__main__":
    main()
