"""irdu_tpu — TPU-native image-restoration-by-unrolling framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`tamthuc1995/ImageRestoration-Development-Unrolling` (graph-smoothness
algorithm-unrolling denoisers: GLR / GTV priors solved by unrolled
CG/ADMM with learned step sizes, driven by learned per-pixel graph
edge weights).

Everything is NHWC, statically shaped, jit-first. The compute path is
pure-functional jnp + Pallas stencil kernels; parallelism is expressed
with `jax.sharding.Mesh` + `shard_map`.

Layer map (mirrors SURVEY.md §1 of the analysis of the reference):
  ops/       L1  graph stencil operators (shift algebra, edge weights, L, C, Cᵀ)
  solvers/   L2  unrolled CG/ADMM iteration stacks
  models/    L3  flax modules: encoder blocks, flagship LGU, pixel family, ablations
  baselines/ L3b Restormer / SwinIR / DRUNet-family parity models
  data/      L4  CSV-indexed patch pipeline, degradation synthesis, augmentation
  train/     L5  config-driven trainer, DP shard_map step, orbax checkpointing
  eval/      L7  full-image eval harness (seed-2204 noise, uint8 PSNR)
  parallel/      mesh + sharding utilities
  utils/         config, logging, seeding
"""

__version__ = "0.1.0"
