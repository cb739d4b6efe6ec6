"""L5 trainer: config-driven training with DP sharding, orbax
checkpointing, and the reference's loss/schedule/eval cadence."""

from irdu_tpu.train.schedules import flagship_lr_schedule, multistep_then_cosine
from irdu_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_forward,
)
