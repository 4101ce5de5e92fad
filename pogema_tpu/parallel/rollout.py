"""On-device trajectory collection: ``lax.scan`` over env steps with the
policy in the loop — zero host round-trips for the whole rollout
(SURVEY.md §7 "shard_map-ped rollout+learner"). The env batch axis is
sharded over the mesh 'data' axis; each chip steps its slice in lockstep.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax


def log_prob_of(logits, actions):
    """log pi(a|s) per agent via a one-hot sum over the tiny action dim:
    ``take_along_axis`` is a gather, and gathers serialize on TPU
    (measured ~100 us/step at B=1024 in benchmarks/policy_step_probe.py).
    """
    oh = actions[..., None] == jnp.arange(
        logits.shape[-1], dtype=actions.dtype
    )
    return jnp.sum(jax.nn.log_softmax(logits) * oh, axis=-1)


@flax.struct.dataclass
class Transition:
    obs: jnp.ndarray  # f32[T, B, N, 3, W, W]
    actions: jnp.ndarray  # i32[T, B, N]
    log_probs: jnp.ndarray  # f32[T, B, N]
    values: jnp.ndarray  # f32[T, B, N]
    rewards: jnp.ndarray  # f32[T, B, N]
    dones: jnp.ndarray  # bool[T, B, N] (per-agent terminated|truncated)
    env_dones: jnp.ndarray  # bool[T, B]
    # Episode metrics, valid only where env_dones (masked sums are taken
    # downstream): dict of f32[T, B] (ISR/CSR/ep_length[/avg_throughput]).
    metrics: dict


@flax.struct.dataclass
class StateTransition:
    """Compact, obs-free trajectory record for the fused learner path.

    Stores the ~136 B/env-step of state the policy's fused first layer
    needs (vs ~49 KB of tile-padded obs tensor) — the PPO update
    recomputes the embedding contraction from these plus the per-env
    static grids (see parallel.learner.make_fused_train_step).
    """

    agents_xy: jnp.ndarray  # i32[T, B, N, 2] (pre-step positions)
    targets_xy: jnp.ndarray  # i32[T, B, N, 2]
    active: jnp.ndarray  # bool[T, B, N]
    actions: jnp.ndarray  # i32[T, B, N]
    log_probs: jnp.ndarray  # f32[T, B, N]
    values: jnp.ndarray  # f32[T, B, N]
    rewards: jnp.ndarray  # f32[T, B, N]
    dones: jnp.ndarray  # bool[T, B, N]
    env_dones: jnp.ndarray  # bool[T, B]
    metrics: dict  # f32[T, B] each, valid where env_dones


def make_state_rollout_fn(core, apply_state, num_steps: int, make_ctx=None,
                          unroll: int = 1):
    """Obs-free rollout: the policy reads EnvState directly through the
    fused embedding (EmbedActorCritic.from_state); observation assembly
    is skipped in the env step too. Returns rollout(params, env_state,
    initial_state, key) -> (env_state, key, StateTransition).

    With ``make_ctx``, a per-rollout context (the precomputed grid
    embedding, EmbedActorCritic.grid_embed — sound because maps are
    static for the whole rollout, parallel.learner._check_static_maps)
    is built ONCE from the initial grids and fed to ``apply_state(params,
    ctx, axy, txy, active)`` every step, hoisting the grid-dependent work
    out of the scan entirely."""
    step_auto = core._make_step_auto(with_obs=False)

    def rollout(params, env_state, initial_state, key):
        ctx = None if make_ctx is None else make_ctx(
            params, env_state.obstacles
        )

        def one(carry, _):
            s, key = carry
            key, k_act = jax.random.split(key)
            grid_in = s.obstacles if make_ctx is None else ctx
            logits, values = apply_state(
                params, grid_in, s.agents_xy, s.targets_xy, s.active
            )
            actions = jax.random.categorical(k_act, logits)
            log_probs = log_prob_of(logits, actions)
            new_state, _, res, env_done, metrics = step_auto(
                s, initial_state, actions
            )
            tr = StateTransition(
                agents_xy=s.agents_xy,
                targets_xy=s.targets_xy,
                active=s.active,
                actions=actions.astype(jnp.int32),
                log_probs=log_probs,
                values=values,
                rewards=res.rewards,
                dones=res.terminated | res.truncated,
                env_dones=env_done,
                metrics=metrics,
            )
            return (new_state, key), tr

        (env_state, key), traj = lax.scan(
            one, (env_state, key), None, length=num_steps, unroll=unroll
        )
        return env_state, key, traj

    return rollout


def make_recurrent_rollout_fn(core, apply_cell, num_steps: int,
                              unroll: int = 1):
    """Obs-free rollout for the recurrent family: the GRU hidden state
    dtype[B, N, H] rides the scan carry and is zeroed where an agent's
    episode ended (a ``where``, not control flow — dones are stored in
    the trajectory, so the PPO update replays the identical hidden-state
    evolution). Returns rollout(params, env_state, initial_state, h,
    key) -> (env_state, h, key, StateTransition)."""
    step_auto = core._make_step_auto(with_obs=False)

    def rollout(params, env_state, initial_state, h, key):
        def one(carry, _):
            s, h, key = carry
            key, k_act = jax.random.split(key)
            new_h, logits, values = apply_cell(
                params, s.obstacles, s.agents_xy, s.targets_xy, s.active, h
            )
            actions = jax.random.categorical(k_act, logits)
            log_probs = log_prob_of(logits, actions)
            new_state, _, res, env_done, metrics = step_auto(
                s, initial_state, actions
            )
            dones = res.terminated | res.truncated
            new_h = jnp.where(dones[..., None], 0, new_h)
            tr = StateTransition(
                agents_xy=s.agents_xy,
                targets_xy=s.targets_xy,
                active=s.active,
                actions=actions.astype(jnp.int32),
                log_probs=log_probs,
                values=values,
                rewards=res.rewards,
                dones=dones,
                env_dones=env_done,
                metrics=metrics,
            )
            return (new_state, new_h, key), tr

        (env_state, h, key), traj = lax.scan(
            one, (env_state, h, key), None, length=num_steps, unroll=unroll
        )
        return env_state, h, key, traj

    return rollout


def make_rollout_fn(core, apply_fn, num_steps: int):
    """Returns rollout(params, env_state, initial_state, obs, key) ->
    (env_state, obs, key, Transition). ``initial_state`` feeds the
    'cached' auto-reset (see core.api)."""
    step_auto = core._make_step_auto()

    def rollout(params, env_state, initial_state, obs, key):
        def one(carry, _):
            env_state, obs, key = carry
            key, k_act = jax.random.split(key)
            logits, values = apply_fn(params, obs)
            actions = jax.random.categorical(k_act, logits)
            log_probs = log_prob_of(logits, actions)
            new_state, new_obs, res, env_done, metrics = step_auto(
                env_state, initial_state, actions
            )
            tr = Transition(
                obs=obs,
                actions=actions.astype(jnp.int32),
                log_probs=log_probs,
                values=values,
                rewards=res.rewards,
                dones=res.terminated | res.truncated,
                env_dones=env_done,
                metrics=metrics,
            )
            return (new_state, new_obs, key), tr

        (env_state, obs, key), traj = lax.scan(
            one, (env_state, obs, key), None, length=num_steps
        )
        return env_state, obs, key, traj

    return rollout
