"""Recurrent (GRU) actor-critic — the memoryful model family.

POGEMA is partially observable (SURVEY.md §0: egocentric (2r+1)² windows;
the ecosystem's learning baselines are recurrent for exactly this
reason), so a policy with memory is the natural second model family next
to the feedforward :class:`~.embed_actor_critic.EmbedActorCritic`.
The reference itself ships no models (SURVEY.md §2) — both families are
NEW TPU-first learner components.

TPU-first design: the first layer reuses the fused window embedding
(:func:`~.embed_actor_critic.embed_state_windows` — the obs tensor is
never materialized, same einsums, shared code so the families cannot
drift), followed by one ``nn.GRUCell`` over the time axis and the same
merged policy/value output GEMM. The hidden state is a dense
dtype[B, N, H] tensor carried through the rollout scan and zeroed where
an agent's episode ended — a ``where``, not control flow, so the whole
rollout stays one XLA program.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..grid_config import NUM_ACTIONS
from .embed_actor_critic import embed_state_windows


class RecurrentEmbedActorCritic(nn.Module):
    """GRU actor-critic over the fused window embedding.

    Both entry points return ``(new_h, logits f32[..., N, 5],
    value f32[..., N])``; callers carry ``h`` (dtype[..., N, hidden]) and
    must zero it where ``done`` (see parallel.rollout
    make_recurrent_rollout_fn)."""

    window: int = 11
    embed: int = 128
    hidden: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        w = self.window
        self.embed_kernel = self.param(
            "embed_kernel",
            nn.initializers.normal(stddev=(3 * w * w) ** -0.5),
            (3, w * w, self.embed),
        )
        self.embed_bias = self.param(
            "embed_bias", nn.initializers.zeros, (self.embed,)
        )
        self.gru = nn.GRUCell(features=self.hidden, dtype=self.dtype,
                              name="gru")
        # Merged logits+value output GEMM, same trick as EmbedActorCritic.
        self.head_out = nn.Dense(NUM_ACTIONS + 1, dtype=jnp.float32,
                                 name="head_out")

    def initial_carry(self, batch_shape):
        """Zero hidden state: dtype[*batch_shape, hidden]."""
        return jnp.zeros((*batch_shape, self.hidden), self.dtype)

    def _finish(self, h, e):
        x = nn.relu(e)
        new_h, y = self.gru(h, x)
        o = self.head_out(y)
        return new_h, o[..., :NUM_ACTIONS], o[..., NUM_ACTIONS]

    def step_from_state(self, grids, agents_xy, targets_xy, active, h):
        """Fused path: one recurrent step from raw state (obs never
        built). grids u8/bf16[B, P, P]; agents_xy/targets_xy
        i32[B, N, 2]; active bool[B, N]; h dtype[B, N, hidden]."""
        e = embed_state_windows(
            self.embed_kernel, self.embed_bias, self.dtype, self.window,
            grids, agents_xy, targets_xy, active,
        )
        return self._finish(h, e)

    def __call__(self, obs, h):
        """Obs path (compat rim / eval): obs f32[..., N, 3, W, W],
        h dtype[..., N, hidden]. Same function as step_from_state on the
        state that produced obs (bf16-rounding equivalence, mirroring
        EmbedActorCritic's test-gated pair)."""
        w = self.window
        kernel = self.embed_kernel.astype(self.dtype)
        x = obs.astype(self.dtype).reshape(*obs.shape[:-3], 3, w * w)
        e = jnp.einsum("...ck,ckh->...h", x, kernel,
                       preferred_element_type=jnp.float32)
        e = (e + self.embed_bias.astype(jnp.float32)).astype(self.dtype)
        return self._finish(h, e)


def init_recurrent_params(key, window: int, embed: int = 128,
                          hidden: int = 128):
    """(model, params) for the recurrent actor-critic; initialization
    goes through step_from_state so both methods share every parameter."""
    model = RecurrentEmbedActorCritic(window=window, embed=embed,
                                      hidden=hidden)
    p = window + 3
    grids = jnp.zeros((1, p, p), jnp.uint8)
    xy = jnp.full((1, 1, 2), window // 2, jnp.int32)
    active = jnp.ones((1, 1), bool)
    h0 = model.initial_carry((1, 1))  # always matches the module dtype
    params = model.init(
        key, grids, xy, xy, active, h0,
        method=RecurrentEmbedActorCritic.step_from_state,
    )
    return model, params
