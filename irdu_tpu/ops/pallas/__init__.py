"""Hand-fused Pallas TPU kernels for the hot paths.

Each kernel has a pure-jnp twin in ops/ or models/; tests assert
equivalence (interpret mode on CPU, real mode on TPU). Kernels are
opt-in via model flags so the fallback path stays authoritative.
"""

from irdu_tpu.ops.pallas.gated_block import fused_gated_block
