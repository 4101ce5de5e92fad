"""On-device batched planner (core/planner.py) vs an independent BFS
oracle, plus the toolbox "Planner" algo rim."""

from collections import deque

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.core.planner import (
    distance_field,
    distance_fields,
    evaluate_planner,
    greedy_actions,
)


def bfs_oracle(padded_grid: np.ndarray, target) -> np.ndarray:
    """Plain deque BFS — the trusted reference for geodesic L1 distance."""
    p = padded_grid.shape[0]
    big = p * p
    dist = np.full((p, p), big, np.int32)
    tx, ty = int(target[0]), int(target[1])
    if padded_grid[tx, ty]:
        return dist
    dist[tx, ty] = 0
    q = deque([(tx, ty)])
    while q:
        x, y = q.popleft()
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nx, ny = x + dx, y + dy
            if 0 <= nx < p and 0 <= ny < p and not padded_grid[nx, ny]:
                if dist[nx, ny] > dist[x, y] + 1:
                    dist[nx, ny] = dist[x, y] + 1
                    q.append((nx, ny))
    return dist


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("size,density", [(8, 0.3), (16, 0.45), (12, 0.6)])
def test_distance_field_matches_bfs(seed, size, density):
    rng = np.random.default_rng(seed)
    grid = (rng.random((size, size)) < density).astype(np.uint8)
    padded = np.pad(grid, 2, constant_values=1)
    free = np.argwhere(padded == 0)
    targets = free[rng.integers(len(free), size=4)]
    got = np.asarray(
        jax.jit(distance_fields)(jnp.asarray(padded), jnp.asarray(targets))
    )
    for t, g in zip(targets, got):
        np.testing.assert_array_equal(g, bfs_oracle(padded, t))


def test_distance_field_obstacle_target_unreachable():
    padded = np.ones((7, 7), np.uint8)
    padded[1:-1, 1:-1] = 0
    padded[3, 1:-1] = 1  # wall splits the map in two
    d = np.asarray(distance_field(jnp.asarray(padded), jnp.asarray([1, 1])))
    big = 49
    assert d[1, 1] == 0
    assert (d[4:-1, 1:-1] == big).all()  # other side unreachable
    assert (d[padded.astype(bool)] == big).all()
    # Target on an obstacle: everything unreachable.
    d2 = np.asarray(distance_field(jnp.asarray(padded), jnp.asarray([3, 3])))
    assert (d2 == big).all()


def test_greedy_descent_is_shortest_path_single_agent():
    """With one agent on a fully known map, greedy descent of the exact
    field reaches the goal in exactly dist(start) steps (A*-optimal)."""
    for seed in range(5):
        cfg = GridConfig(seed=seed, size=12, density=0.3, num_agents=1,
                         obs_radius=2, max_episode_steps=128)
        core = PogemaCore(cfg, num_envs=1, device="default")
        state, _ = core.reset(jax.random.key(seed))
        dist = np.asarray(
            jax.vmap(distance_fields)(state.obstacles, state.targets_xy)
        )[0, 0]
        start = np.asarray(state.agents_xy)[0, 0]
        d0 = int(dist[start[0], start[1]])
        assert d0 < 12 * 12  # reachable by construction
        final, metrics = evaluate_planner(core, seed=seed)
        assert float(metrics["ISR"][0]) == 1.0
        assert int(np.asarray(final.step_count)[0]) == d0


def test_greedy_actions_stay_cases():
    padded = np.zeros((6, 6), np.uint8)
    padded[0] = padded[-1] = 1
    padded[:, 0] = padded[:, -1] = 1
    dist = distance_fields(jnp.asarray(padded), jnp.asarray([[2, 2], [3, 3]]))
    # Agent 0 on its goal -> stay; agent 1 adjacent to its goal -> move.
    acts = np.asarray(
        greedy_actions(dist, jnp.asarray([[2, 2], [3, 2]]), jnp.ones(2, bool))
    )
    assert acts[0] == 0
    assert acts[1] != 0
    # Inactive agents emit 0.
    acts2 = np.asarray(
        greedy_actions(dist, jnp.asarray([[2, 2], [3, 2]]), jnp.zeros(2, bool))
    )
    assert (acts2 == 0).all()


def test_agent_avoidance_blocks_occupied_cell():
    padded = np.ones((7, 7), np.uint8)
    padded[3, 1:-1] = 0  # single corridor row
    dist = distance_fields(
        jnp.asarray(padded), jnp.asarray([[3, 5], [3, 1]])
    )
    xy = jnp.asarray([[3, 2], [3, 3]])  # agent 1 sits in agent 0's way
    acts = np.asarray(greedy_actions(dist, xy, jnp.ones(2, bool)))
    # Agent 0's only improving move (right, onto agent 1) is penalized and
    # every detour is a wall -> stay beats moving away in a dead-end
    # corridor? No: moving left increases d; stay keeps d. Stay wins.
    assert acts[0] == 0
    acts_noavoid = np.asarray(
        greedy_actions(dist, xy, jnp.ones(2, bool), avoid_agents=False)
    )
    assert acts_noavoid[0] != 0  # without avoidance it walks into the clash


def test_evaluate_planner_batched_multi_agent():
    cfg = GridConfig(seed=3, size=16, density=0.3, num_agents=8,
                     obs_radius=5, max_episode_steps=64)
    core = PogemaCore(cfg, num_envs=16, device="default")
    _, metrics = evaluate_planner(core, seed=3)
    isr = float(np.mean(np.asarray(metrics["ISR"])))
    # Privileged centralized planner with avoidance: near-perfect on
    # density-0.3 16x16 (deterministic given the seed).
    assert isr >= 0.9
    assert float(np.mean(np.asarray(metrics["ep_length"]))) < 64


def test_evaluate_planner_rejects_lifelong():
    cfg = GridConfig(seed=0, size=8, num_agents=2, on_target="restart")
    core = PogemaCore(cfg, num_envs=2, device="default")
    with pytest.raises(ValueError, match="LifeLong"):
        evaluate_planner(core)


def test_toolbox_planner_algo():
    from pogema_tpu.toolbox import evaluate

    env = {"size": 10, "density": 0.3, "num_agents": 4, "obs_radius": 3,
           "observation_type": "MAPF", "max_episode_steps": 64}
    res = evaluate(env, algo="Planner", seeds=[0, 1])
    assert res["env"]["ISR"] >= 0.9
    rnd = evaluate(env, algo="random", seeds=[0, 1])
    assert res["env"]["ISR"] > rnd["env"]["ISR"]
    assert res["env"]["ep_length"] <= rnd["env"]["ep_length"]


def test_toolbox_planner_requires_mapf_obs():
    from pogema_tpu.toolbox import evaluate

    with pytest.raises(ValueError, match="MAPF"):
        evaluate({"size": 8, "num_agents": 2}, algo="Planner", seeds=[0])


def test_toolbox_planner_lifelong_recaches_on_respawn():
    """Under on_target='restart' the rim policy must recompute fields
    when a respawn moves a target (cache keyed on (map, targets)); it
    should score repeatedly and far outpace random."""
    from pogema_tpu.toolbox import evaluate

    env = {"size": 10, "density": 0.2, "num_agents": 3, "obs_radius": 3,
           "observation_type": "MAPF", "on_target": "restart",
           "max_episode_steps": 48}
    res = evaluate(env, algo="Planner", seeds=[0])["env"]
    rnd = evaluate(env, algo="random", seeds=[0])["env"]
    assert res["avg_throughput"] > 3 * max(rnd["avg_throughput"], 0.01)
