"""Flagship model: convolutional actor-critic over egocentric MAPF
observations.

The reference ships no models (it is an env library; SURVEY.md §2 notes
the learning baselines live in separate repos) — this is the NEW
TPU-first learner component demanded by the north star
(/root/repo/BASELINE.json:5 "sharded MARL learner over ICI collectives").

Design for the MXU: all heavy math is batched dense/conv in bfloat16
with f32 accumulation; per-agent observations [B, N, 3, W, W] fold agents
into the batch axis so one big GEMM serves B*N agents. The trunk Dense
layer is tensor-shardable over a 'model' mesh axis (see
:func:`partition_params`)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..grid_config import NUM_ACTIONS


class ActorCritic(nn.Module):
    """Input: f32/bf16[..., 3, W, W] egocentric obs. Output: (logits
    [..., 5], value [...])."""

    hidden: int = 512
    channels: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(self.dtype)
        # NCHW -> NHWC
        x = jnp.moveaxis(x, -3, -1)
        x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(x)
        x = nn.relu(x)
        x = x.reshape(*x.shape[:-3], -1)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="trunk")(x)
        x = nn.relu(x)
        logits = nn.Dense(NUM_ACTIONS, dtype=jnp.float32, name="policy")(x)
        value = nn.Dense(1, dtype=jnp.float32, name="value")(x)
        return logits, jnp.squeeze(value, -1)


def init_params(key, window: int, hidden: int = 512, channels: int = 64):
    model = ActorCritic(hidden=hidden, channels=channels)
    dummy = jnp.zeros((1, 3, window, window), jnp.float32)
    return model, model.init(key, dummy)


def partition_params(params, mesh):
    """Tensor-parallel layout: the trunk Dense kernel is sharded over the
    'model' mesh axis (column parallel — each shard owns hidden/model_size
    output features); everything else is replicated. XLA inserts the
    all-gather/psum over ICI where the sharded activations meet the
    replicated heads (scaling-book recipe: annotate, let XLA place
    collectives)."""
    from jax.sharding import NamedSharding

    def spec_for(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if "trunk" in names and names[-1] == "kernel":
            return P(None, "model")
        if "trunk" in names and names[-1] == "bias":
            return P("model")
        # Recurrent family: all six GRU gate kernels are column-parallel
        # over the hidden axis (the carried h is then 'model'-sharded;
        # the h-side contractions become row-parallel psums and the
        # replicated head gathers — GSPMD places the collectives).
        if "gru" in names and names[-1] == "kernel":
            return P(None, "model")
        if "gru" in names and names[-1] == "bias":
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, NamedSharding(mesh, spec_for(path, leaf))),
        params,
    )
