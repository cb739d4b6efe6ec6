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
from irdu_tpu.parallel.tensor import (
    make_dp_tp_mesh,
    param_shardings,
    shard_train_state,
    train_state_shardings,
)
