"""L3 model zoo: flax modules built on the solver + ops layers."""

from irdu_tpu.models.blocks import (
    CustomLayerNorm,
    LocalGatedLinearBlock,
    LocalNonLinearBlock,
    LocalLowpassFilteringBlock,
    RegionalPixelEmbedding,
)
from irdu_tpu.models.flagship import AbstractMultiScaleGraphFilter
