from .actor_critic import ActorCritic, init_params, partition_params
from .embed_actor_critic import EmbedActorCritic, init_embed_params
from .recurrent import RecurrentEmbedActorCritic, init_recurrent_params

__all__ = [
    "ActorCritic",
    "init_params",
    "partition_params",
    "EmbedActorCritic",
    "init_embed_params",
    "RecurrentEmbedActorCritic",
    "init_recurrent_params",
]
