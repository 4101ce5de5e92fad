"""Environment semantics: reset / step for ONE env instance (no batch
axis) — the TPU-native counterpart of the reference's ``Pogema.step`` /
``Pogema.reset`` (upstream: pogema/envs.py, SURVEY.md §3.2–3.3).

The public vectorized API (``pogema_tpu.core.api``) vmaps these over the
batch axis and jits the result; nothing here touches the host.

Step order matches the reference call stack (SURVEY.md §3.3):
  1. collision-resolved movement (``collisions.resolve_moves``);
  2. on-target handling per ``on_target`` mode:
       'finish'  — reward 1.0 on the arrival step, agent is hidden
                   (deactivated) and marked terminated;
       'nothing' — no reward; episode terminates for everyone when all
                   agents stand on their goals simultaneously (CoopFinish);
       'restart' — reward 1.0 per goal, the goal respawns on-device to a
                   uniform free cell of the agent's component (LifeLong);
  3. step counter + truncation at max_episode_steps (MultiTimeLimit);
  4. observation assembly from the new state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..grid_config import StaticConfig
from ..ops import windows as windows_mod
from . import collisions, generator, obs as obs_mod
from .types import EnvState, StepResult


def _queue_len(cfg: StaticConfig) -> int:
    # An agent can score at most once per step, so max_episode_steps
    # entries are exhaustive; the cap bounds queue memory for long
    # episodes. When max_episode_steps > the cap, an agent scoring more
    # than queue_len goals wraps the queue cyclically — the wrap seam is
    # constrained at build time (q_0 != q_{Q-1}, see build_target_queue)
    # so a wrapping agent can never score while standing still.
    return min(cfg.max_episode_steps, 64)


def reset_one(
    cfg: StaticConfig,
    key,
    fixed_map=None,
    fixed_agents_xy=None,
    fixed_targets_xy=None,
    maze: bool = False,
    map_bank=None,
) -> EnvState:
    """Fresh EnvState for one env. jit/vmap-compatible."""
    key, gen_key, queue_key = jax.random.split(key, 3)
    grid, agents_xy, targets_xy, comps, placement_ok = generator.generate_env(
        cfg, gen_key, fixed_map, fixed_agents_xy, fixed_targets_xy, maze, map_bank
    )
    n = cfg.num_agents
    target_queue = None
    if cfg.on_target == "restart":
        table = generator.build_respawn_table(comps, cfg.padded_size)
        target_queue = generator.build_target_queue(
            queue_key, table, comps,
            generator.xy_to_cells(targets_xy, cfg.padded_size),
            _queue_len(cfg), cfg.padded_size,
        )
    return EnvState(
        obstacles=grid,
        obstacle_nibbles=windows_mod.pack_nibbles(grid),
        agents_xy=agents_xy,
        targets_xy=targets_xy,
        target_queue=target_queue,
        active=jnp.ones(n, bool),
        terminated=jnp.zeros(n, bool),
        on_goal_ever=jnp.zeros(n, bool),
        goals_achieved=jnp.zeros(n, jnp.int32),
        step_count=jnp.int32(0),
        key=key,
        placement_ok=placement_ok,
    )


def observe_one(cfg: StaticConfig, state: EnvState):
    return obs_mod.observe(
        cfg, state.obstacles, state.agents_xy, state.targets_xy, state.active
    )


def step_one(cfg: StaticConfig, state: EnvState, actions):
    """One env step. actions: i32[N] in [0, 5). Returns (EnvState, StepResult)."""
    p = cfg.padded_size
    n = cfg.num_agents

    new_xy = collisions.resolve_moves(
        cfg, state.obstacles, state.agents_xy, state.active, actions,
        obstacles_nib=state.obstacle_nibbles,
    )
    on_goal = jnp.all(new_xy == state.targets_xy, axis=-1) & state.active

    active = state.active
    terminated = state.terminated
    targets_xy = state.targets_xy
    target_queue = state.target_queue
    key = state.key
    goals_achieved = state.goals_achieved + on_goal.astype(jnp.int32)
    on_goal_ever = state.on_goal_ever | on_goal

    if cfg.on_target == "finish":
        rewards = on_goal.astype(jnp.float32)
        terminated = terminated | on_goal
        active = active & ~on_goal
    elif cfg.on_target == "nothing":
        rewards = jnp.zeros(n, jnp.float32)
        all_on_goal = jnp.all(jnp.all(new_xy == targets_xy, axis=-1))
        terminated = jnp.broadcast_to(all_on_goal, (n,))
    else:  # 'restart' (LifeLong)
        rewards = on_goal.astype(jnp.float32)
        # Gather-free respawn, head-pointer form: the queue is
        # EPISODE-INVARIANT (never written on the step path) and
        # goals_achieved is the head pointer — the k-th scored goal reads
        # queue[(k-1) mod Q] via a one-hot dot. vs the previous roll
        # scheme (identical goal sequence, cyclic in both) this removes
        # the [B, N, Q] write-back every step, and lets cached auto-reset
        # skip the queue leaf entirely (core/api.py select_done).
        queue = state.target_queue  # int[N, Q] flat cell ids
        q_len = queue.shape[-1]
        head = (goals_achieved - 1) % q_len  # post-increment count
        head_oh = head[:, None] == jnp.arange(q_len)[None, :]
        new_cells = jnp.sum(
            jnp.where(head_oh, queue.astype(jnp.int32), 0), axis=-1
        )
        new_targets = generator.cells_to_xy(new_cells, p)
        targets_xy = jnp.where(on_goal[:, None], new_targets, targets_xy)

    step_count = state.step_count + 1
    truncated = jnp.broadcast_to(step_count >= cfg.max_episode_steps, (n,))

    new_state = state.replace(
        agents_xy=new_xy,
        targets_xy=targets_xy,
        target_queue=target_queue,
        active=active,
        terminated=terminated,
        on_goal_ever=on_goal_ever,
        goals_achieved=goals_achieved,
        step_count=step_count,
        key=key,
    )
    observations = observe_one(cfg, new_state)
    return new_state, StepResult(
        observations=observations,
        rewards=rewards,
        terminated=terminated,
        truncated=truncated,
    )


def episode_done(cfg: StaticConfig, state: EnvState):
    """Scalar bool: this env's episode is over (all terminated or time
    limit hit)."""
    if cfg.on_target == "restart":
        return state.step_count >= cfg.max_episode_steps
    return jnp.all(state.terminated) | (state.step_count >= cfg.max_episode_steps)
