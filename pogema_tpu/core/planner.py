"""On-device batched shortest-path planner.

TPU-native counterpart of the ecosystem's scripted planners (upstream:
pogema/a_star_policy.py runs one host A* per agent per step inside a
Python loop; SURVEY.md §3.4). Here the plan is a per-agent BFS
distance-to-goal field computed ONCE per episode by iterated segmented
directional relaxation sweeps — the same single-``lax.cummax`` encoding
as ``core.generator.connected_components`` — and every step's action is
a greedy descent of that field, so a whole evaluation rollout (B envs ×
N agents) runs as one jitted program with zero host round-trips.

Why a distance field instead of A*: A* is a priority-queue algorithm —
data-dependent control flow that cannot tile onto a TPU. The full BFS
field costs a handful of log-depth scans per episode, amortized over all
steps, and greedy descent of an exact distance field IS shortest-path
optimal for a single agent (each optimal move decreases the distance by
exactly 1). Multi-agent congestion is handled greedily: moves onto cells
currently occupied by other agents are penalized and the agent takes the
best remaining option (stay when nothing improves).

Semantics notes:
* Distances are geodesic L1 over 4-connectivity on the padded grid
  (exactly what the reference's A* with unit costs computes on fully
  known maps). Unreachable/obstacle cells get ``big = P*P``.
* Supported for static-target modes ('finish'/'nothing'). LifeLong
  respawns change targets mid-episode; use the host A* policy there or
  recompute fields at a cadence.
"""

from __future__ import annotations

from functools import partial

import numpy as _np

import jax
import jax.numpy as jnp
from jax import lax

from ..grid_config import MOVES, StaticConfig

_MOVES = _np.asarray(MOVES, _np.int32)  # host constant (see collisions.py)


def _dist_relax_scan(d, obstacle, axis, reverse, big):
    """Segmented distance relaxation along ``axis``:
    forward:  d'[i] = min_{j<=i, same free segment} d[j] + (i - j)
    reverse:  d'[i] = min_{j>=i, same free segment} d[j] + (j - i)

    The affine cost folds into the flood fill's cummax encoding by
    shearing with the index: e[j] = d[j] -/+ j (offset by +p to stay
    non-negative), then a segmented running min of e un-sheared at i is
    exactly the relaxation. One native ``lax.cummax`` per call —
    direction/axis via the primitive's own ``reverse=``/``axis=``
    (NEVER flip/transpose composition: XLA:TPU miscompiles that fusion
    at batch scale, see docs/DESIGN.md "Hazards")."""
    p = d.shape[axis]
    shape = [1] * d.ndim
    shape[axis] = p
    idx = jnp.arange(p, dtype=jnp.int32).reshape(shape)
    shear = idx if reverse else -idx
    e = d + shear + p  # >= 0 (d >= 0, shear >= -(p-1))
    k = jnp.int32(big + 2 * p + 4)  # > max(e) = big + 2p
    seg = lax.cumsum(obstacle.astype(jnp.int32), axis=axis, reverse=reverse)
    w = seg * k + (k - 1 - jnp.minimum(e, k - 1))
    w = lax.cummax(w, axis=axis, reverse=reverse)
    out = (k - 1) - (w - seg * k) - p - shear
    return jnp.minimum(out, big)


def distance_field(padded_grid, target_xy):
    """Exact BFS (L1 geodesic, 4-connectivity) distance to ``target_xy``
    over one padded grid. Returns i32[P, P]; obstacles and unreachable
    cells get ``P*P``. Jit-safe; vmap over targets/envs."""
    p = padded_grid.shape[-1]
    big = p * p
    obstacle = padded_grid.astype(bool)
    rows = jnp.arange(p, dtype=jnp.int32)[:, None]
    cols = jnp.arange(p, dtype=jnp.int32)[None, :]
    at_target = (rows == target_xy[0]) & (cols == target_xy[1])
    d0 = jnp.where(at_target & ~obstacle, 0, big).astype(jnp.int32)

    def sweep(d):
        d = _dist_relax_scan(d, obstacle, axis=1, reverse=False, big=big)
        d = _dist_relax_scan(d, obstacle, axis=1, reverse=True, big=big)
        d = _dist_relax_scan(d, obstacle, axis=0, reverse=False, big=big)
        return _dist_relax_scan(d, obstacle, axis=0, reverse=True, big=big)

    def cond(carry):
        d, prev, it = carry
        return jnp.any(d != prev) & (it < big)

    def body(carry):
        d, _, it = carry
        return sweep(d), d, it + 1

    d, _, _ = lax.while_loop(cond, body, (sweep(d0), d0, jnp.int32(0)))
    return jnp.where(obstacle, big, d)


def distance_fields(padded_grid, targets_xy):
    """i32[N, P, P]: one field per agent target over a shared grid."""
    return jax.vmap(distance_field, in_axes=(None, 0))(padded_grid, targets_xy)


def greedy_actions(dist, agents_xy, active, avoid_agents: bool = True,
                   key=None, escape_prob: float = 0.5):
    """Greedy descent of per-agent distance fields (one env; vmap over B).

    dist: i32[N, P, P]; agents_xy: i32[N, 2]; active: bool[N].
    Action = argmin over {stay, 4 moves} of the distance at the resulting
    cell, ties broken toward the lower action index (so 'stay' wins when
    no move improves — including the on-goal and fully-blocked cases).
    ``avoid_agents`` penalizes cells *currently* occupied by other active
    agents (collision systems would cancel those moves anyway; avoiding
    them lets the agent route around instead of banging into walls of
    teammates). Returns i32[N].

    Deadlock escape (``key`` given): pure greed deadlocks in corridors —
    two agents that must pass each other both refuse the non-improving
    backup move and stand forever. An agent that is *stuck* (chose 'stay'
    while off-goal) takes, with probability ``escape_prob``, a uniformly
    random free & unoccupied move instead — the same stochastic fallback
    the reference's scripted A* agent uses when planning fails
    (upstream: pogema/a_star_policy.py, SURVEY.md §2 "A* baseline").

    All lookups are one-hot contractions — no gathers (poison on TPU,
    see ops/windows.py). Scores stay < 2^24 so the f32 math is exact.
    """
    n, p = dist.shape[0], dist.shape[-1]
    big = p * p
    cand = agents_xy[:, None, :] + jnp.asarray(_MOVES)[None, :, :]  # [N, 5, 2]
    # Border padding (width obs_radius >= 1, all obstacles) keeps cand in
    # bounds; clamp anyway so r=0 custom grids cannot index out.
    cand = jnp.clip(cand, 0, p - 1)
    ar = jnp.arange(p, dtype=jnp.int32)
    oh_r = (cand[..., 0, None] == ar).astype(jnp.float32)  # [N, 5, P]
    oh_c = (cand[..., 1, None] == ar).astype(jnp.float32)
    d_cand = jnp.einsum(
        "nap,npq,naq->na", oh_r, dist.astype(jnp.float32), oh_c,
        preferred_element_type=jnp.float32,
    )  # [N, 5], integer-valued (< P^2 < 2^24)

    score = d_cand * 8.0 + jnp.arange(5, dtype=jnp.float32)[None, :]
    occupied = jnp.zeros((n, 5), bool)
    if avoid_agents and n > 1:
        cur_cells = agents_xy[:, 0] * p + agents_xy[:, 1]  # [N]
        cand_cells = cand[..., 0] * p + cand[..., 1]  # [N, 5]
        other = active[None, :] & ~jnp.eye(n, dtype=bool)  # [n, j]
        occupied = jnp.any(
            (cand_cells[:, :, None] == cur_cells[None, None, :]) & other[:, None, :],
            axis=-1,
        )  # [N, 5]
        score = score + occupied.astype(jnp.float32) * (8.0 * big)
    act = jnp.argmin(score, axis=-1).astype(jnp.int32)

    if key is not None:
        stuck = active & (act == 0) & (d_cand[:, 0] > 0)
        # Free cell, nobody on it, not 'stay' (elementwise mask, never a
        # scatter — XLA:TPU drops tiny scatters at batch scale, see
        # docs/DESIGN.md "Hazards").
        movable = (d_cand < big) & ~occupied & (jnp.arange(5) > 0)[None, :]
        k_move, k_flip = jax.random.split(key)
        # Uniform choice over the movable set via exponential race.
        u = jax.random.uniform(k_move, (n, 5), minval=1e-6, maxval=1.0)
        rand_act = jnp.argmax(
            jnp.where(movable, -jnp.log(u), -jnp.inf), axis=-1
        ).astype(jnp.int32)
        can_move = jnp.any(movable, axis=-1)
        do_escape = (
            stuck & can_move
            & (jax.random.uniform(k_flip, (n,)) < escape_prob)
        )
        act = jnp.where(do_escape, rand_act, act)
    return jnp.where(active, act, 0)


def make_planner_policy(cfg: StaticConfig, avoid_agents: bool = True,
                        escape_prob: float = 0.5):
    """(plan, act) pair for batched states.

    plan(state)       -> dist i32[B, N, P, P]  (call once per episode)
    act(dist, state, key=None) -> actions i32[B, N]  (call every step;
    pass a fresh PRNG key to enable stochastic deadlock escape)

    Both are jit-safe pure functions of the batched ``EnvState``.
    """
    del cfg  # shapes come from the arrays; kept for API symmetry

    def plan(state):
        return jax.vmap(distance_fields)(state.obstacles, state.targets_xy)

    def act(dist, state, key=None):
        b = state.agents_xy.shape[0]
        keys = None if key is None else jax.random.split(key, b)
        return jax.vmap(
            partial(greedy_actions, avoid_agents=avoid_agents,
                    escape_prob=escape_prob)
        )(dist, state.agents_xy, state.active, key=keys)

    return plan, act


def make_planner_evaluator(core, avoid_agents: bool = True):
    """Compile-once batched planner evaluation: returns ``run(key) ->
    (final_state, {metric: f32[B]})``, a jitted function running one full
    episode (B envs to the time limit) on device — reset, per-agent BFS
    fields (computed once), greedy-descent scan. Build it once and call
    it per seed; rebuilding re-traces (~minutes of XLA compile at scale).

    ``core``: a :class:`~pogema_tpu.core.api.PogemaCore` with a static-
    target mode ('finish'/'nothing'); raises for LifeLong."""
    from . import metrics as metrics_mod
    from . import step as step_mod

    if core.cfg.on_target == "restart":
        raise ValueError(
            "the planner evaluator needs static targets; LifeLong "
            "respawns change goals mid-episode (use the host A* policy "
            "or recompute fields at a cadence)"
        )
    cfg = core.cfg
    plan, act = make_planner_policy(cfg, avoid_agents=avoid_agents)

    @jax.jit
    def run(key):
        # Reset consumes the caller's key verbatim (so the episode matches
        # core.reset(key) exactly); the escape-move stream is folded off it.
        state, _ = core._reset(key)
        key = jax.random.fold_in(key, 0x9E3779B9)
        dist = plan(state)

        def one(carry, _):
            st, k = carry
            k, k_act = jax.random.split(k)
            # Freeze finished envs (so ep_length/step_count stop at the
            # true episode end instead of running to the time limit).
            done = jax.vmap(partial(step_mod.episode_done, cfg))(st)
            actions = act(dist, st, k_act)
            new_state, _ = jax.vmap(partial(step_mod.step_one, cfg))(st, actions)

            def sel(new, old):
                d = done.reshape(done.shape + (1,) * (new.ndim - 1))
                return jnp.where(d, old, new)

            return (jax.tree.map(sel, new_state, st), k), None

        (state, _), _ = lax.scan(
            one, (state, key), None, length=cfg.max_episode_steps
        )
        metrics = jax.vmap(partial(metrics_mod.episode_metrics, cfg))(state)
        return state, metrics

    def run_checked(key):
        state, metrics = run(key)
        # Same loud-failure contract as PogemaCore.reset: unplaceable
        # configs must raise, not return metrics over garbage positions.
        if not bool(jnp.all(state.placement_ok)):
            n_bad = int(jnp.sum(~state.placement_ok))
            raise ValueError(
                f"agent/target placement failed for {n_bad} env(s) "
                "during planner evaluation (unplaceable config)"
            )
        return state, metrics

    return run_checked


def evaluate_planner(core, seed: int = 0, avoid_agents: bool = True):
    """One-call convenience over :func:`make_planner_evaluator` with a
    compile cache ON the core instance (so cores are collectable and
    repeated calls with different seeds pay tracing once)."""
    cache = core.__dict__.setdefault("_planner_evaluators", {})
    run = cache.get(avoid_agents)
    if run is None:
        run = make_planner_evaluator(core, avoid_agents=avoid_agents)
        cache[avoid_agents] = run
    return run(core.make_key(seed))
