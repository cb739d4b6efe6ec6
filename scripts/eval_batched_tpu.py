"""VERDICT r1 #7 done-criterion: full-set batched eval wall-clock per
image ≤ 2× the single-image model time. CBSD68-like synthetic set
(24 images, 321×481 / 481×321), flagship bf16+pallas."""
from __future__ import annotations
import time
import jax, jax.numpy as jnp, numpy as np
from irdu_tpu.data.synthetic import make_synthetic_image
from irdu_tpu.eval.harness import evaluate_pairs, evaluate_pairs_batched
from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter, flagship_config

rng = np.random.RandomState(1)
images = [make_synthetic_image(rng, 321, 481) if i % 2 else
          make_synthetic_image(rng, 481, 321) for i in range(24)]

model = AbstractMultiScaleGraphFilter(use_pallas_blocks=True,
                                      use_pallas_solver=True,
                                      **flagship_config())
x0 = jnp.asarray(np.zeros((1, 64, 64, 3), np.float32))
params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
fwd = jax.jit(model.apply)

def forward(batch):
    return fwd(params, jnp.asarray(batch, jnp.bfloat16)).astype(jnp.float32)

# warm both bucket shapes (pad to /64: 352x512 and 512x352) at batch 4
for hw in ((352, 512), (512, 352)):
    np.asarray(forward(np.zeros((4, *hw, 3), np.float32)))

out = evaluate_pairs_batched(lambda b: forward(b), images, sigma=25.0,
                             bucket=64, batch_size=4, device_metrics=True)
per_img = out["seconds_total"] / len(images)
print(f"batched: {out['mp_per_s']:.2f} MP/s  total {out['seconds_total']:.2f}s "
      f"({per_img*1e3:.0f} ms/img)  mean_psnr {out['mean_psnr']:.2f}", flush=True)

# single-image model time (same buckets, batch 1, sequential protocol)
for hw in ((352, 512), (512, 352)):
    np.asarray(forward(np.zeros((1, *hw, 3), np.float32)))
seq = evaluate_pairs(lambda b: np.asarray(forward(b)), images, sigma=25.0,
                     bucket=64)
t_model = float(np.median(seq["seconds"]))
print(f"sequential median per-image model time: {t_model*1e3:.0f} ms; "
      f"batched per-image {per_img*1e3:.0f} ms "
      f"({per_img/t_model:.2f}x single-image time; criterion ≤ 2)", flush=True)
