from .actor_critic import ActorCritic, init_params, partition_params

__all__ = ["ActorCritic", "init_params", "partition_params"]
