"""Collision resolution — vectorized counterparts of the reference's three
``collision_system`` modes (upstream: pogema/envs.py + pogema/grid.py,
SURVEY.md §2 "Collision systems").

All three operate on one env (no batch axis); the caller vmaps over envs.

TPU-native design: NO grid-sized scatters or gathers anywhere. With
N agents (N <= a few hundred), every conflict predicate — vertex, swap,
follow-into-occupied — is a pairwise [N, N] cell-equality reduction on
the VPU, and obstacle validation reads a 3x3 MXU-extracted neighborhood
(ops.windows). Measured on a v5e, the scatter/gather formulation of these
same semantics ran 20-50x slower.

Semantics (confidence flags per SURVEY.md — 'soft' details are provisional
until golden fixtures pin them):

* ``priority`` [HIGH]: agents move strictly in index order; agent i's
  move is checked against obstacles and the occupancy at its turn —
  agents j>i still at their old cells, agents j<i at their new ones
  (lower index wins). The sequential loop is re-expressed as a Jacobi
  fixpoint: ``M_i = valid_i ∧ ¬∃j>i: c_j=t_i ∧ ¬∃j<i: f_j(M)=t_i``.
  The dependency "i depends on f_j for j<i" forms a DAG ordered by agent
  index, so the iteration has a unique fixpoint equal to the sequential
  result and converges in (max follow-chain depth) iterations — a
  ``lax.while_loop`` of cheap [N, N] passes instead of an N-step serial
  scan. Equivalence is test-gated against the sequential NumPy oracle.
* ``block_both`` [HIGH names / MED details]: single parallel pass — a
  move succeeds iff the target cell is (a) not an obstacle, (b) not the
  *current* cell of any active agent (so swaps and follow-into-vacated
  chains are both blocked), and (c) not targeted by any other agent.
* ``soft`` [LOW]: permissive fixpoint — vertex conflicts and swaps cancel
  both movers, but following into a cell being vacated this step IS
  allowed; blocked movers become stayers and may block others (chains),
  iterated to fixpoint.
"""

from __future__ import annotations

import numpy as _np

import jax.numpy as jnp
from jax import lax

from ..grid_config import MOVES, StaticConfig
from ..ops.windows import point_lookup, point_lookup_packed

# Host constants (numpy, NOT device arrays: module-level device arrays
# get embedded as jit constants via a device->host fetch at lowering).
_MOVES = _np.asarray(MOVES, _np.int32)


def propose(obstacles, agents_xy, active, actions, obstacles_nib=None):
    """Proposed positions after obstacle/bounds validation (the obstacle
    border of width obs_radius >= 1 makes bounds checks free).

    ``obstacles_nib``: optional nibble-packed obstacle columns
    (EnvState.obstacle_nibbles) — 4x less lookup traffic, bit-identical
    result; falls back to the raw-grid lookup when None.

    Returns (desired i32[N, 2], moving bool[N]) where desired == current
    for blocked/inactive/staying agents.
    """
    # actions -> deltas via one-hot dot (t_a[actions] is a gather; gathers
    # are poison on TPU even at [N] scale when vmapped to [B, N]).
    act_oh = (actions[:, None] == jnp.arange(5)[None, :]).astype(jnp.int32)
    deltas = act_oh @ jnp.asarray(_MOVES)  # [N, 2]
    proposed = agents_xy + deltas
    if obstacles_nib is not None:
        hits_obstacle = point_lookup_packed(obstacles_nib, proposed) > 0.5
    else:
        hits_obstacle = point_lookup(obstacles, proposed) > 0.5
    valid = active & ~hits_obstacle
    desired = jnp.where(valid[:, None], proposed, agents_xy)
    # Flat cell ids: all conflict predicates become single i32 compares
    # instead of [.., 2] coordinate compares + reduce.
    p = obstacles.shape[-1]
    cur_cells = agents_xy[:, 0] * p + agents_xy[:, 1]
    des_cells = jnp.where(valid, cur_cells + deltas[:, 0] * p + deltas[:, 1], cur_cells)
    moving = valid & (des_cells != cur_cells)
    return desired, des_cells, cur_cells, moving


def _eq(a_cells, b_cells):
    """bool[N, M]: flat cell a[n] == flat cell b[m]."""
    return a_cells[:, None] == b_cells[None, :]


def _pack_bits(x):
    """bool[..., N] -> u32[..., ceil(N/32)] bitmask (bit j of word w =
    x[..., 32w + j]). Summing distinct powers of two = bitwise OR."""
    n = x.shape[-1]
    pad = (-n) % 32
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xw = x.reshape(*x.shape[:-1], -1, 32)
    powers = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(xw.astype(jnp.uint32) * powers, axis=-1, dtype=jnp.uint32)


def _priority_fixpoint_setup(des_cells, cur_cells, active, moving):
    """Shared Jacobi machinery for resolve_priority and its diagnostic
    twin: returns (m0, one_pass) where one_pass(m) applies one fixpoint
    pass. Single source of truth for the blocking predicate — the depth
    instrument is only meaningful while it runs the exact resolver body.

    The [N, N] conflict matrices are loop invariants; additionally the
    j-axis is bit-packed into u32 words so each Jacobi pass touches
    N/32x less data (the iteration count is the follow-chain depth, so
    the per-pass cost dominates the fixpoint).
    f_j = t_j if m_j else c_j; "f_j == t_i" for j<i blocks i:
      blocked_i = OR_j (E1[i,j] & m_j) | (E2[i,j] & ~m_j)
    """
    n = des_cells.shape[0]
    tgt_on_cur = _eq(des_cells, cur_cells) & active[None, :]  # t_i == c_j
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]  # [i, j]: j > i
    # Static blockers: some later-indexed agent currently sits on my target
    # (it moves after me, so it is still there at my turn).
    m0 = moving & ~jnp.any(tgt_on_cur & later, axis=1)
    earlier_active = (idx[None, :] < idx[:, None]) & active[None, :]
    e1 = _pack_bits(_eq(des_cells, des_cells) & earlier_active)  # [N, W]
    e2 = _pack_bits(tgt_on_cur & earlier_active)

    def one_pass(m):
        mp = _pack_bits(m)[None, :]  # [1, W]
        blocked = jnp.any(((e1 & mp) | (e2 & ~mp)) != 0, axis=-1)
        return m0 & ~blocked

    return m0, one_pass


# Jacobi passes applied per while_loop iteration on the hot resolvers.
# Unrolling k passes per cond is SEMANTICS-SAFE (the update
# m <- m0 & ~blocked(m) is monotone decreasing, so passes beyond the
# fixpoint are no-ops and "k passes changed nothing" is exactly the k=1
# fixpoint) — but it is a MEASURED NEGATIVE on the headline workload:
# config C bench (4096 envs, depth 3-4 typical) gives 9.86M / 9.67M /
# 8.56M env-steps/s at k=1/2/4 — at real batch sizes a pass is HBM
# traffic, not ~1 us, and extra no-op passes cost more than the saved
# cond stalls. k>1 only helps deep adversarial chains (N=64 follow
# chain: 1.42 -> 0.86 ms at k=4, benchmarks/fixpoint_adversarial.py),
# which random/trained policies don't form (measured depth 3-12).
# Keep k=1; see DESIGN.md "Negative results".
_UNROLL = 1

# Jacobi passes PEELED ahead of the while_loop (distinct from _UNROLL,
# which multiplies passes INSIDE the loop body). Peeled passes fuse into
# the surrounding step program (no loop-trip dispatch/cond stall), and
# when the fixpoint is reached within the peel the while_loop's cond is
# false on entry — zero trips. Semantics-safe for any value (the update
# is monotone; passes past the fixpoint are no-ops). Typical measured
# depth is 3-4 on random policies (benchmarks/fixpoint_probe.py), so a
# small peel converts most loop trips into fused inline ops.
# Measured (benchmarks/fixpoint_peel_probe.py, full production step,
# 2048-step scans, v5e): config C 9.90/10.12/10.23/9.90/9.28 M
# env-steps/s at peel 0/2/3/4/6; config D 3.51/3.56/3.58/3.51/3.32.
# peel=3 wins on both (+3.3% / +2.0%); past the typical depth the
# extra inline passes are pure cost, hence the fall at 4-6.
_PEEL = 3


def _peel_then_fixpoint(m0, one_pass, k_unroll):
    """Run ``_PEEL`` inline passes, then iterate ``one_pass`` to the
    fixpoint with a while_loop (``k_unroll`` passes per trip)."""
    m = m0
    prev = jnp.zeros_like(m0) | ~m0  # != m0, so cond starts true at peel 0
    for _ in range(_PEEL):
        prev = m
        m = one_pass(m)

    def body(carry):
        mm, _ = carry
        p = mm
        for _ in range(k_unroll):
            mm = one_pass(mm)
        return mm, p

    def cond(carry):
        mm, p = carry
        return jnp.any(mm != p)

    m, _ = lax.while_loop(cond, body, (m, prev))
    return m


def resolve_priority(obstacles, agents_xy, active, actions, obstacles_nib=None):
    desired, des_cells, cur_cells, moving = propose(
        obstacles, agents_xy, active, actions, obstacles_nib)
    m0, one_pass = _priority_fixpoint_setup(des_cells, cur_cells, active, moving)
    m = _peel_then_fixpoint(m0, one_pass, _UNROLL)
    return jnp.where(m[:, None], desired, agents_xy)


def resolve_block_both(obstacles, agents_xy, active, actions, obstacles_nib=None):
    desired, des_cells, cur_cells, moving = propose(
        obstacles, agents_xy, active, actions, obstacles_nib)
    n = agents_xy.shape[0]
    not_self = ~jnp.eye(n, dtype=bool)
    # (b) target is someone's current cell; (c) someone else targets it too.
    tgt_on_cur = _eq(des_cells, cur_cells) & active[None, :]
    tgt_clash = _eq(des_cells, des_cells) & active[None, :] & not_self
    blocked = jnp.any(tgt_on_cur, axis=1) | jnp.any(tgt_clash & moving[None, :], axis=1)
    m = moving & ~blocked
    return jnp.where(m[:, None], desired, agents_xy)


def resolve_soft(obstacles, agents_xy, active, actions, obstacles_nib=None):
    desired, des_cells, cur_cells, moving = propose(
        obstacles, agents_xy, active, actions, obstacles_nib)
    n = agents_xy.shape[0]
    not_self = ~jnp.eye(n, dtype=bool)
    act = active[None, :]
    # Vertex conflicts among movers cancel everyone involved (computed once).
    tgt_clash = _eq(des_cells, des_cells) & act & not_self
    vertex = jnp.any(tgt_clash & moving[None, :], axis=1)
    # Swaps: occupant j of my target is moving into my cell.
    tgt_on_cur = _eq(des_cells, cur_cells) & act  # [i, j]: t_i == c_j
    their_tgt_on_my_cur = _eq(cur_cells, des_cells)  # [i, j]: t_j == c_i
    swap = jnp.any(tgt_on_cur & their_tgt_on_my_cur & not_self, axis=1)
    m0 = moving & ~vertex & ~swap

    # Chains: a mover into the current cell of a stayer becomes a stayer.
    # Same bit-packed fixpoint trick (and _UNROLL rationale) as
    # resolve_priority.
    e2 = _pack_bits(tgt_on_cur)

    def one_pass(m):
        mp = _pack_bits(m)[None, :]
        blocked = jnp.any((e2 & ~mp) != 0, axis=-1)
        return m0 & ~blocked

    m = _peel_then_fixpoint(m0, one_pass, _UNROLL)
    return jnp.where(m[:, None], desired, agents_xy)


def priority_fixpoint_depth(obstacles, agents_xy, active, actions,
                            obstacles_nib=None):
    """Diagnostic twin of :func:`resolve_priority`: the number of Jacobi
    passes until the fixpoint (== the longest follow-chain depth this
    step, the iteration count the while_loop actually pays). i32 scalar
    for one env; vmap over a batch and reduce for a profile.

    The worst case is N (a full N-agent follow chain whose index order
    opposes the motion direction); measured on random policies it is 3-4
    at 128 agents (benchmarks/fixpoint_probe.py). Use this to instrument
    adversarial policies that might form long chains (CLAUDE.md
    "fixpoint worst case"). Off the hot path — compiled only when called.
    """
    _, des_cells, cur_cells, moving = propose(
        obstacles, agents_xy, active, actions, obstacles_nib)
    m0, one_pass = _priority_fixpoint_setup(des_cells, cur_cells, active, moving)

    def body(carry):
        m, _, it = carry
        return one_pass(m), m, it + 1

    def cond(carry):
        m, prev, _ = carry
        return jnp.any(m != prev)

    _, _, depth = lax.while_loop(
        cond, body, (m0, jnp.zeros_like(m0) | ~m0, jnp.int32(0))
    )
    return depth


_RESOLVERS = {
    "priority": resolve_priority,
    "block_both": resolve_block_both,
    "soft": resolve_soft,
}


def resolve_moves(cfg: StaticConfig, obstacles, agents_xy, active, actions,
                  obstacles_nib=None):
    """Dispatch on the (static) collision system. ``obstacles`` is the
    padded u8[P, P] grid of one env; ``obstacles_nib`` the optional
    nibble-packed companion (EnvState.obstacle_nibbles)."""
    if cfg.num_agents == 1:
        # Single agent: no agent-agent conflict is possible under ANY
        # system, so the obstacle-validated proposal IS the resolution.
        # Cuts the [N, N] machinery and the fixpoint while_loop from the
        # program — at B=1 (config A) the step is op-count-bound, not
        # FLOP-bound, so dead tiny ops dominate the step latency.
        desired, _, _, _ = propose(obstacles, agents_xy, active, actions,
                                   obstacles_nib)
        return desired
    return _RESOLVERS[cfg.collision_system](obstacles, agents_xy, active,
                                            actions, obstacles_nib)
