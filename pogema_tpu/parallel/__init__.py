from .mesh import make_mesh, shard_batch, initialize_distributed
from .rollout import make_rollout_fn, make_state_rollout_fn
from .learner import (
    PPOConfig,
    make_train_step,
    init_train_state,
    make_fused_train_step,
    make_fused_train_many,
    init_fused_train_state,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "initialize_distributed",
    "make_rollout_fn",
    "make_state_rollout_fn",
    "PPOConfig",
    "make_train_step",
    "init_train_state",
    "make_fused_train_step",
    "make_fused_train_many",
    "init_fused_train_state",
]
