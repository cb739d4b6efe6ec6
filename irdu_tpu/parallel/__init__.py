"""Mesh + sharding utilities: the TPU-native replacement for what a
torch codebase would do with DDP/NCCL."""

from irdu_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from irdu_tpu.parallel.spatial import (
    halo_shard_forward,
    sharded_tiled_forward,
    tiled_forward,
)
