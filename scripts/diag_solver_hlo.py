"""Diagnose the scale0 filtering block: XLA cost analysis (flops, bytes)
+ optimized-HLO op census, to decide the fused-kernel design."""
from __future__ import annotations
import collections, re
import jax, jax.numpy as jnp, numpy as np
from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config

model = AbstractMultiScaleGraphFilter(use_pallas_blocks=True, **flagship_config())
rng = np.random.RandomState(0)
x32 = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32))
params = jax.jit(model.init)(jax.random.PRNGKey(0), x32)
params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

xs = jnp.asarray(rng.rand(1, 512, 512, 48), jnp.bfloat16)
fn = jax.jit(lambda z: model.apply(params, z, method=lambda m, z: m.local_filters[0](z)))
lowered = fn.lower(xs)
comp = lowered.compile()
ca = comp.cost_analysis()
if isinstance(ca, list): ca = ca[0]
flops = ca.get("flops", 0); byts = ca.get("bytes accessed", 0)
print(f"flops={flops/1e9:.2f} G  bytes={byts/1e9:.3f} GB  "
      f"t@680GB/s={byts/680e9*1e3:.2f} ms  t@2TF/s-VPU={flops/2e12*1e3:.2f} ms")
for k in sorted(ca):
    if k.startswith("bytes accessed") and ca[k] > 50e6:
        print(f"  {k}: {ca[k]/1e9:.3f} GB")
hlo = comp.as_text()
ops = collections.Counter()
for m in re.finditer(r"^\s*(?:ROOT )?%?[\w.\-]+ = (\w+)", hlo, re.M):
    ops[m.group(1)] += 1
print("op census:", dict(ops.most_common(15)))
# biggest fusions by shape volume in their root
big = re.findall(r"(bf16|f32)\[([\d,]+)\][^=]*= fusion", hlo)
vol = collections.Counter()
for dt, dims in big:
    n = int(np.prod([int(d) for d in dims.split(",")]))
    vol[(dt, dims)] += 1
print("fusion output shapes (top):")
for (dt, dims), cnt in vol.most_common(12):
    print(f"  {dt}[{dims}] x{cnt}")
