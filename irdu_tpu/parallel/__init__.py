"""Mesh + sharding utilities: the TPU-native replacement for what a
torch codebase would do with DDP/NCCL."""

from irdu_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
