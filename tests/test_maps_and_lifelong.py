"""Map registry + LifeLong respawn-queue semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pogema_tpu import GridConfig, PogemaCore, pogema_v0
from pogema_tpu.maps import get_map, list_maps, register_map


def test_registry_contents():
    assert "empty-8x8" in list_maps()
    with pytest.raises(KeyError):
        get_map("nope")
    register_map("tiny-test", "..\n..")
    assert get_map("tiny-test") == "..\n.."
    with pytest.raises(ValueError):
        register_map("tiny-test", "..")


def test_map_name_in_config():
    cfg = GridConfig(seed=0, map_name="warehouse-16x16", num_agents=4, obs_radius=2)
    assert cfg.size == 16
    env = pogema_v0(cfg)
    env.reset()
    grid = env.get_obstacles()
    # warehouse shelf pattern present
    assert grid[1, 1] == 1 and grid[0, 0] == 0


def test_lifelong_respawn_semantics():
    """Over a long rollout: every respawned goal is a free cell in the
    agent's connected component and never the cell the agent stands on at
    respawn time (reference generate_new_target semantics)."""
    cfg_m = GridConfig(seed=3, size=10, density=0.25, num_agents=4,
                       obs_radius=2, max_episode_steps=48, on_target="restart")
    core = PogemaCore(cfg_m, num_envs=2)
    cfg = cfg_m.to_static()
    state, obs = core.reset(0)

    from pogema_tpu.core import generator

    comps = {
        b: np.asarray(
            generator.connected_components(state.obstacles[b])
        )
        for b in range(2)
    }
    p = cfg.padded_size
    rng = np.random.default_rng(0)
    total_goals = 0
    prev_targets = np.asarray(state.targets_xy)
    for t in range(48):
        actions = rng.integers(0, 5, size=(2, 4))
        state, res, done, mets = core.step(state, jnp.asarray(actions))
        grid = np.asarray(state.obstacles)
        xy = np.asarray(state.agents_xy)
        targ = np.asarray(state.targets_xy)
        rew = np.asarray(res.rewards)
        for b in range(2):
            for n in range(4):
                cell = targ[b, n, 0] * p + targ[b, n, 1]
                assert grid[b, targ[b, n, 0], targ[b, n, 1]] == 0
                agent_cell = xy[b, n, 0] * p + xy[b, n, 1]
                assert comps[b][cell] == comps[b][agent_cell], "target left component"
                if rew[b, n] > 0:
                    total_goals += 1
                    # respawned goal differs from the agent's position
                    assert not np.array_equal(targ[b, n], xy[b, n])
                    # and from the goal just reached
                    assert not np.array_equal(targ[b, n], prev_targets[b, n])
        prev_targets = targ.copy()
    assert int(np.asarray(state.goals_achieved).sum()) == total_goals


def test_lifelong_scoring_respawn_chain():
    """Deterministic scoring: agent chases its goal with A*-like greedy
    moves; every respawn must move the goal off the agent's cell."""
    cfg = GridConfig(seed=1, size=6, obs_radius=2, num_agents=1,
                     map="\n".join(["." * 6] * 6), agents_xy=[[0, 0]],
                     targets_xy=[[0, 3]], on_target="restart",
                     max_episode_steps=40)
    core = PogemaCore(cfg, num_envs=1)
    state, obs = core.reset(0)
    goals = 0
    for t in range(40):
        xy = np.asarray(state.agents_xy)[0, 0]
        tg = np.asarray(state.targets_xy)[0, 0]
        if tg[0] < xy[0]:
            a = 1
        elif tg[0] > xy[0]:
            a = 2
        elif tg[1] < xy[1]:
            a = 3
        elif tg[1] > xy[1]:
            a = 4
        else:
            a = 0
        state, res, done, mets = core.step(state, jnp.asarray([[a]]))
        if float(res.rewards[0, 0]) > 0:
            goals += 1
            new_tg = np.asarray(state.targets_xy)[0, 0]
            now_xy = np.asarray(state.agents_xy)[0, 0]
            assert not np.array_equal(new_tg, now_xy)
    assert goals >= 3
    assert int(state.goals_achieved[0, 0]) == goals
    assert float(mets["avg_throughput"][0]) == pytest.approx(goals / 40)


def test_movingai_loader():
    from pogema_tpu.maps import load_movingai

    text = """type octile
height 4
width 5
map
..@..
.@@.T
.....
T...@
"""
    grid = load_movingai(text)
    assert grid == [
        [0, 0, 1, 0, 0],
        [0, 1, 1, 0, 1],
        [0, 0, 0, 0, 0],
        [1, 0, 0, 0, 1],
    ]
    cfg = GridConfig(seed=0, map=grid, num_agents=2, obs_radius=2,
                     max_episode_steps=4)
    env = pogema_v0(cfg)
    env.reset()
    assert env.get_obstacles().shape[0] >= 4
