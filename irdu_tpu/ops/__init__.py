"""L1 ops core: graph stencil operators as pure jnp functions.

Everything here is layout-native NHWC (images) / grouped-NHWC
``(B, H, W, G, F)`` (graph signals: G graphs ("mixture hypotheses"),
F node-features per graph). All functions are pure, statically shaped,
and built from a single shift primitive so XLA fuses the whole stencil
pipeline; Pallas fused versions live in ``ops.pallas``.
"""

from irdu_tpu.ops.windows import (
    EDGE_DELTAS_CROSS4,
    EDGE_DELTAS_DIAMOND12,
    window_to_deltas,
)
from irdu_tpu.ops.shifts import shift2d
from irdu_tpu.ops.graph import (
    normalize_features,
    extract_edge_weights,
    op_l_norm,
    op_c,
    op_c_transpose,
    stats_conv,
    stats_conv_transpose,
    glr_apply,
    gtv_apply,
)
