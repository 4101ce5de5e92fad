"""Global shortest-path planner as a toolbox algo (name: "Planner").

Host rim over :mod:`pogema_tpu.core.planner`: consumes 'MAPF'
observations (global obstacle map + all agents'/targets' global
coordinates — the reference's centralized-planner observation type,
SURVEY.md §2 "Observations"), computes per-agent BFS distance-to-goal
fields with the jitted device planner, and descends them greedily with
agent avoidance.

The fields are cached per (map, targets) pair, so they are recomputed
only on a new episode — or, under LifeLong, whenever a respawn moves a
target (which makes this policy a valid LifeLong baseline, unlike the
pure device-side ``evaluate_planner`` fast path that plans once).

vs the decentralized :class:`~pogema_tpu.a_star_policy.BatchAStarAgent`:
this policy sees the whole map (privileged, like the reference
evaluations that give planners full maps via 'MAPF' obs), so it is the
stronger scripted baseline; A* with partial observability remains the
reference-faithful decentralized one.
"""

from __future__ import annotations

import numpy as np

from .core.planner import distance_fields, greedy_actions

_JITTED = {}


def _jitted(name):
    # Module-level jit cache (a fresh jax.jit wrapper per call would
    # retrace every step).
    if not _JITTED:
        import jax

        _JITTED["distance_fields"] = jax.jit(distance_fields)
        _JITTED["greedy_actions"] = jax.jit(
            greedy_actions, static_argnames="avoid_agents"
        )
    return _JITTED[name]


class GlobalPlannerPolicy:
    """Toolbox policy: ``act(observations) -> list[int]``.

    Requires ``observation_type='MAPF'`` (raises otherwise — the global
    map is what makes a centralized planner centralized)."""

    def __init__(self, avoid_agents: bool = True, seed: int = 0,
                 on_goal_inactive: bool = True):
        """on_goal_inactive: treat agents standing on their goal as
        passable. Matches on_target='finish' (the default mode), where
        the env hides finished agents but MAPF obs still report their
        last coordinates — without this they would be avoided as phantom
        blockers forever. Pass False for on_target='nothing', where
        on-goal agents really do keep occupying their cells."""
        self._avoid_agents = bool(avoid_agents)
        self._on_goal_inactive = bool(on_goal_inactive)
        self._seed = int(seed)
        self._step_idx = 0
        self._cache_key = None
        self._dist = None

    def reset_states(self):
        self._step_idx = 0
        self._cache_key = None
        self._dist = None

    def act(self, observations) -> list:
        ob0 = observations[0]
        if not isinstance(ob0, dict) or "global_obstacles" not in ob0:
            raise ValueError(
                "GlobalPlannerPolicy needs observation_type='MAPF' "
                "(global_obstacles/global_xy/global_target_xy in obs)"
            )
        grid = np.asarray(ob0["global_obstacles"], np.uint8)
        targets = np.asarray(ob0["global_target_xy"], np.int32)
        xy = np.asarray(ob0["global_xy"], np.int32)

        import jax.numpy as jnp

        key = (grid.tobytes(), targets.tobytes())
        if key != self._cache_key:
            # Pad with a 1-cell obstacle border: the device planner's
            # candidate cells assume the padded-grid convention.
            padded = np.pad(grid, 1, constant_values=1)
            self._dist = _jitted("distance_fields")(
                jnp.asarray(padded), jnp.asarray(targets + 1)
            )
            self._cache_key = key

        n = xy.shape[0]
        import jax

        step_key = jax.random.fold_in(
            jax.random.key(self._seed), self._step_idx
        )
        self._step_idx += 1
        if self._on_goal_inactive:
            active = ~np.all(xy == targets, axis=-1)
        else:
            active = np.ones(n, bool)
        actions = _jitted("greedy_actions")(
            self._dist, jnp.asarray(xy + 1), jnp.asarray(active),
            avoid_agents=self._avoid_agents, key=step_key,
        )
        return np.asarray(actions).astype(int).tolist()
