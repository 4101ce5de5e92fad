"""EnvState — the whole environment as one device pytree.

TPU-native replacement for the reference's mutable ``Grid`` object
(upstream: pogema/grid.py — obstacle matrix, positions_xy, finishes_xy,
is_active): here every field is a JAX array with an optional leading batch
axis ``B`` so thousands of envs step in lockstep under one jitted call,
and the state shards over a ``Mesh('data')`` axis for multi-chip runs.

Coordinates are (row, col) in the *padded* grid: the obstacle matrix is
border-padded by ``obs_radius`` on every side (the reference's slicing
trick), so a cell (x, y) of the logical S×S grid lives at
(x + r, y + r) and observation windows never go out of bounds.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class EnvState:
    # u8[..., P, P] with P = size + 2*obs_radius; 1 = obstacle.
    obstacles: jnp.ndarray
    # i32[..., N, 2] padded coords of agents / their goals.
    agents_xy: jnp.ndarray
    targets_xy: jnp.ndarray
    # LifeLong only (None otherwise): int[..., N, Q] pre-sampled queue
    # of future goal cells per agent (i16 when cell ids fit), all inside
    # the agent's connected component with consecutive entries distinct
    # (so the head never equals the just-reached goal the agent stands
    # on). EPISODE-INVARIANT: respawn reads entry (goals_achieved-1) % Q
    # via a one-hot dot — no step-path writes, no gathers (TPU gathers
    # serialize; see ops/windows.py).
    target_queue: jnp.ndarray
    # bool[..., N]: active = visible & moving (finish mode hides agents on
    # goal); terminated = per-agent done flag as returned by step.
    active: jnp.ndarray
    terminated: jnp.ndarray
    # bool[..., N]: ever reached its goal this episode (drives ISR/CSR).
    on_goal_ever: jnp.ndarray
    # i32[..., N]: number of goals achieved this episode (LifeLong throughput).
    goals_achieved: jnp.ndarray
    # i32[...]: steps taken this episode.
    step_count: jnp.ndarray
    # PRNG key per env (consumed by LifeLong respawn and auto-reset).
    key: jnp.ndarray
    # bool[...]: False when on-device placement failed every bounded retry
    # (unplaceable config). Host callers (PogemaCore.reset, the rim) check
    # this and raise loudly — the reference raises on unplaceable configs.
    placement_ok: jnp.ndarray = True
    # bf16[..., P, ceil(P/4)] nibble-packed obstacle columns (episode-
    # invariant, built once per reset): the move-validation lookup
    # contracts against 4x fewer columns than the raw grid — see
    # ops.windows.pack_nibbles. None in states built by legacy callers;
    # the step path then falls back to the unpacked lookup.
    obstacle_nibbles: jnp.ndarray = None

    @property
    def batch_shape(self):
        return self.step_count.shape

    @property
    def num_agents(self):
        return self.agents_xy.shape[-2]


@flax.struct.dataclass
class StepResult:
    """Everything ``step`` hands back besides the new state."""

    observations: object  # f32[..., N, 3, W, W] or a dict for POMAPF/MAPF
    rewards: jnp.ndarray  # f32[..., N]
    terminated: jnp.ndarray  # bool[..., N]
    truncated: jnp.ndarray  # bool[..., N]
