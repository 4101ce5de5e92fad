from .mesh import make_mesh, shard_batch, initialize_distributed
from .rollout import (
    make_rollout_fn,
    make_state_rollout_fn,
    make_recurrent_rollout_fn,
)
from .evaluator import make_policy_evaluator
from .learner import (
    PPOConfig,
    make_train_step,
    init_train_state,
    make_fused_train_step,
    make_fused_train_many,
    init_fused_train_state,
    init_recurrent_train_state,
    make_recurrent_train_step,
    make_recurrent_train_many,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "initialize_distributed",
    "make_rollout_fn",
    "make_state_rollout_fn",
    "make_recurrent_rollout_fn",
    "PPOConfig",
    "make_train_step",
    "init_train_state",
    "make_fused_train_step",
    "make_fused_train_many",
    "init_fused_train_state",
    "init_recurrent_train_state",
    "make_recurrent_train_step",
    "make_recurrent_train_many",
    "make_policy_evaluator",
]
