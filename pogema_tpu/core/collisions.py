"""Collision resolution — vectorized counterparts of the reference's three
``collision_system`` modes (upstream: pogema/envs.py + pogema/grid.py,
SURVEY.md §2 "Collision systems").

All three operate on one env (no batch axis); the caller vmaps over envs.
Positions are (row, col) in the padded grid; cells are flattened indices.

Semantics (confidence flags per SURVEY.md — 'soft' details are provisional
until golden fixtures pin them):

* ``priority`` [HIGH]: agents move strictly in index order; each move is
  checked against obstacles and the occupancy *including earlier movers*
  (lower index wins). Expressed as a ``lax.fori_loop`` over agents
  updating a flat occupancy bitmap — O(N) sequential, each iteration a
  handful of one-element gathers/scatters that stay B-vectorized under
  vmap.
* ``block_both`` [HIGH names / MED details]: single parallel pass — a move
  succeeds iff the target cell is (a) not an obstacle, (b) not the
  *current* cell of any active agent (so swaps and follow-into-vacated
  chains are both blocked), and (c) not targeted by any other agent.
  Conflicting parties all stay, hence the name.
* ``soft`` [LOW]: permissive fixpoint — vertex conflicts (two movers, one
  cell) and swaps cancel both movers, but following into a cell being
  vacated this step IS allowed; blocked movers become stayers and may
  block others (chains), iterated to fixpoint with ``lax.while_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..grid_config import MOVES, StaticConfig

# Host constant (numpy, NOT a device array: a module-level device array
# would be committed to whatever backend is default at import time and
# embedding it as a jit constant forces a device->host transfer during
# lowering).
import numpy as _np

_MOVES = _np.asarray(MOVES, _np.int32)


def propose(obstacles_flat, agents_xy, active, actions, p):
    """Common prologue: proposed positions and obstacle/bounds validity.
    The obstacle border (width obs_radius >= 1) makes bounds checks free."""
    cur = agents_xy
    proposed = cur + jnp.asarray(_MOVES)[actions]
    prop_cells = proposed[..., 0] * p + proposed[..., 1]
    hits_obstacle = obstacles_flat[prop_cells].astype(bool)
    valid = active & ~hits_obstacle
    return jnp.where(valid[..., None], proposed, cur), prop_cells


def resolve_priority(obstacles_flat, agents_xy, active, actions, p):
    n = agents_xy.shape[0]
    cur_cells = agents_xy[..., 0] * p + agents_xy[..., 1]
    desired, _ = propose(obstacles_flat, agents_xy, active, actions, p)
    des_cells = desired[..., 0] * p + desired[..., 1]

    occ = jnp.zeros(p * p, bool).at[cur_cells].max(active)

    def body(i, carry):
        occ, pos_cells = carry
        cur = pos_cells[i]
        tgt = des_cells[i]
        ok = active[i] & ~occ[tgt]
        new = jnp.where(ok, tgt, cur)
        occ = occ.at[cur].set(jnp.where(ok, False, occ[cur]))
        occ = occ.at[new].max(active[i])
        return occ, pos_cells.at[i].set(new)

    _, new_cells = lax.fori_loop(0, n, body, (occ, cur_cells))
    return jnp.stack([new_cells // p, new_cells % p], axis=-1).astype(jnp.int32)


def resolve_block_both(obstacles_flat, agents_xy, active, actions, p):
    cur_cells = agents_xy[..., 0] * p + agents_xy[..., 1]
    desired, _ = propose(obstacles_flat, agents_xy, active, actions, p)
    des_cells = desired[..., 0] * p + desired[..., 1]

    tgt_count = jnp.zeros(p * p, jnp.int32).at[des_cells].add(active.astype(jnp.int32))
    src_occ = jnp.zeros(p * p, bool).at[cur_cells].max(active)
    moving = active & (des_cells != cur_cells)
    blocked = moving & ((tgt_count[des_cells] > 1) | src_occ[des_cells])
    new_cells = jnp.where(moving & ~blocked, des_cells, cur_cells)
    return jnp.stack([new_cells // p, new_cells % p], axis=-1).astype(jnp.int32)


def resolve_soft(obstacles_flat, agents_xy, active, actions, p):
    n = agents_xy.shape[0]
    cur_cells = agents_xy[..., 0] * p + agents_xy[..., 1]
    desired, _ = propose(obstacles_flat, agents_xy, active, actions, p)
    des_cells = desired[..., 0] * p + desired[..., 1]

    # Owner of each currently-occupied cell (for swap detection).
    agent_ids = jnp.arange(n, dtype=jnp.int32)
    owner = (
        jnp.full(p * p, -1, jnp.int32)
        .at[cur_cells]
        .max(jnp.where(active, agent_ids, -1))
    )
    moving0 = active & (des_cells != cur_cells)

    # Vertex conflicts among movers never un-conflict, compute once.
    mover_count = (
        jnp.zeros(p * p, jnp.int32).at[des_cells].add(moving0.astype(jnp.int32))
    )
    vertex = moving0 & (mover_count[des_cells] > 1)
    # Swap: the occupant j of my target cell is moving into my cell.
    j = owner[des_cells]
    has_j = j >= 0
    swap = moving0 & has_j & (des_cells[jnp.maximum(j, 0)] == cur_cells) & (j != agent_ids)
    moving0 = moving0 & ~vertex & ~swap

    def cond(carry):
        moving, prev = carry
        return jnp.any(moving != prev)

    def body(carry):
        moving, _ = carry
        # Stayers (incl. blocked movers) occupy their current cells.
        stay_occ = jnp.zeros(p * p, bool).at[cur_cells].max(active & ~moving)
        blocked = moving & stay_occ[des_cells]
        return moving & ~blocked, moving

    stay_occ = jnp.zeros(p * p, bool).at[cur_cells].max(active & ~moving0)
    moving1 = moving0 & ~stay_occ[des_cells]
    moving, _ = lax.while_loop(cond, body, (moving1, moving0))
    new_cells = jnp.where(moving, des_cells, cur_cells)
    return jnp.stack([new_cells // p, new_cells % p], axis=-1).astype(jnp.int32)


_RESOLVERS = {
    "priority": resolve_priority,
    "block_both": resolve_block_both,
    "soft": resolve_soft,
}


def resolve_moves(cfg: StaticConfig, obstacles, agents_xy, active, actions):
    """Dispatch on the (static) collision system. ``obstacles`` is the
    padded u8[P, P] grid of one env."""
    p = cfg.padded_size
    return _RESOLVERS[cfg.collision_system](
        obstacles.reshape(-1), agents_xy, active, actions, p
    )
