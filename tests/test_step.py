"""Env semantics tests: rewards, termination, truncation, LifeLong
respawn, observations, metrics; plus full-step differential rollouts vs
the NumPy oracle (SURVEY.md §4 styles 2-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.utils.oracle import OracleEnv

STAY, UP, DOWN, LEFT, RIGHT = range(5)


def line_env(on_target="finish", **kw):
    """1 agent at (0,0), goal (0,2) on an open 4x4 grid."""
    cfg = GridConfig(
        seed=0, size=4, obs_radius=2, num_agents=1,
        agents_xy=[[0, 0]], targets_xy=[[0, 2]], map="....\n....\n....\n....",
        on_target=on_target, max_episode_steps=8, **kw,
    )
    return PogemaCore(cfg, num_envs=1)


def unbatch(x):
    return jax.tree.map(lambda a: np.asarray(a)[0], x)


def test_finish_reward_and_hide():
    env = line_env("finish")
    state, obs = env.reset(0)
    a = jnp.asarray([[RIGHT]])
    state, res, done, _ = env.step(state, a)
    assert float(res.rewards[0, 0]) == 0.0
    state, res, done, _ = env.step(state, a)
    assert float(res.rewards[0, 0]) == 1.0
    assert bool(res.terminated[0, 0])
    assert bool(done[0])
    assert not bool(state.active[0, 0])
    # reward only on the arrival step, not after
    state, res, done, _ = env.step(state, a)
    assert float(res.rewards[0, 0]) == 0.0


def test_nothing_mode_coop_finish():
    env = line_env("nothing")
    state, obs = env.reset(0)
    a = jnp.asarray([[RIGHT]])
    state, res, done, _ = env.step(state, a)
    assert not bool(res.terminated[0, 0])
    state, res, done, _ = env.step(state, a)
    assert float(res.rewards[0, 0]) == 0.0  # no reward in 'nothing'
    assert bool(res.terminated[0, 0])  # all agents on goals -> done
    assert bool(state.active[0, 0])  # agent does NOT disappear
    # stepping off the goal un-terminates (coop criterion is simultaneous)
    state, res, done, _ = env.step(state, a)
    assert not bool(res.terminated[0, 0])


def test_restart_mode_respawns_target():
    env = line_env("restart")
    state, obs = env.reset(0)
    a = jnp.asarray([[RIGHT]])
    state, res, done, _ = env.step(state, a)
    state, res, done, _ = env.step(state, a)
    assert float(res.rewards[0, 0]) == 1.0
    assert not bool(res.terminated[0, 0])
    assert bool(state.active[0, 0])
    # target moved off the agent's cell
    assert not np.array_equal(np.asarray(state.targets_xy[0, 0]),
                              np.asarray(state.agents_xy[0, 0]))
    assert int(state.goals_achieved[0, 0]) == 1


def test_truncation_at_max_steps():
    env = line_env("finish")
    state, obs = env.reset(0)
    a = jnp.asarray([[STAY]])
    for i in range(8):
        state, res, done, _ = env.step(state, a)
    assert bool(res.truncated[0, 0])
    assert bool(done[0])


def test_observation_channels():
    env = line_env("finish")
    state, obs = env.reset(0)
    o = np.asarray(obs)[0, 0]  # [3, 5, 5]
    r = 2
    # obstacle channel: agent at logical (0,0) -> borders visible
    assert o[0, r, r] == 0  # own cell free
    assert o[0, 0, :].all()  # rows above are border obstacle
    assert o[0, :, 0].all()
    # agents channel: self at center
    assert o[1, r, r] == 1
    assert o[1].sum() == 1
    # target at (0,2) rel (0,+2) -> window pos (r, r+2)
    assert o[2, r, r + 2] == 1
    assert o[2].sum() == 1


def test_target_projected_to_border():
    cfg = GridConfig(
        seed=0, size=8, obs_radius=2, num_agents=1, map="." * 8 + ("\n" + "." * 8) * 7,
        agents_xy=[[0, 0]], targets_xy=[[0, 7]], max_episode_steps=8,
    )
    env = PogemaCore(cfg, num_envs=1)
    state, obs = env.reset(0)
    o = np.asarray(obs)[0, 0]
    # target is 7 to the right, clamped to +2 -> window border
    assert o[2, 2, 4] == 1


def test_metrics_isr_csr():
    cfg = GridConfig(
        seed=0, size=4, obs_radius=2, num_agents=2, map="....\n....\n....\n....",
        agents_xy=[[0, 0], [3, 0]], targets_xy=[[0, 1], [3, 3]],
        max_episode_steps=4, on_target="finish",
    )
    env = PogemaCore(cfg, num_envs=1)
    state, obs = env.reset(0)
    a = jnp.asarray([[RIGHT, STAY]])
    for _ in range(4):
        state, res, done, mets = env.step(state, a)
    assert bool(done[0])
    assert float(mets["ISR"][0]) == 0.5  # agent 0 made it, agent 1 didn't
    assert float(mets["CSR"][0]) == 0.0
    assert float(mets["ep_length"][0]) == 4.0


def test_lifelong_throughput_metric():
    env = line_env("restart")
    state, obs = env.reset(0)
    # shuttle right; count rewards collected over the episode
    total = 0.0
    a = jnp.asarray([[RIGHT]])
    for _ in range(8):
        state, res, done, mets = env.step(state, a)
        total += float(res.rewards.sum())
    assert bool(done[0])
    assert float(mets["avg_throughput"][0]) == pytest.approx(total / 8)


@pytest.mark.parametrize("system", ["priority", "block_both", "soft"])
@pytest.mark.parametrize("on_target", ["finish", "nothing"])
def test_full_rollout_differential_vs_oracle(system, on_target):
    cfg_model = GridConfig(
        seed=11, size=10, density=0.25, num_agents=6, obs_radius=3,
        collision_system=system, on_target=on_target, max_episode_steps=16,
    )
    env = PogemaCore(cfg_model, num_envs=2)
    state, obs = env.reset(3)
    cfg = cfg_model.to_static()

    oracles = [
        OracleEnv(
            cfg,
            np.asarray(state.obstacles[b]),
            np.asarray(state.agents_xy[b]),
            np.asarray(state.targets_xy[b]),
        )
        for b in range(2)
    ]
    assert np.allclose(np.asarray(obs)[0], oracles[0].observe())

    rng = np.random.default_rng(0)
    for t in range(16):
        actions = rng.integers(0, 5, size=(2, 6))
        state, res, done, _ = env.step(state, jnp.asarray(actions))
        for b, oracle in enumerate(oracles):
            rew, term, trunc, _ = oracle.step(actions[b])
            assert np.asarray(state.agents_xy[b]).tolist() == [
                list(t_) for t_ in oracle.agents_xy
            ], f"positions diverged at step {t}"
            assert np.allclose(np.asarray(res.rewards[b]), rew)
            assert np.asarray(res.terminated[b]).tolist() == term
            assert np.asarray(res.truncated[b]).tolist() == trunc
            assert np.asarray(state.active[b]).tolist() == oracle.active
            assert np.allclose(np.asarray(res.observations[b]), oracle.observe())


def test_determinism_same_seed():
    cfg = GridConfig(seed=1, size=8, density=0.3, num_agents=3, max_episode_steps=8)
    env = PogemaCore(cfg, num_envs=4)
    s1, o1 = env.reset(7)
    s2, o2 = env.reset(7)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    a = jnp.ones((4, 3), jnp.int32)
    r1 = env.step(s1, a)
    r2 = env.step(s2, a)
    assert np.array_equal(np.asarray(r1[1].rewards), np.asarray(r2[1].rewards))
    assert np.array_equal(np.asarray(r1[0].agents_xy), np.asarray(r2[0].agents_xy))


def test_batch_envs_differ():
    cfg = GridConfig(seed=1, size=16, density=0.3, num_agents=4)
    env = PogemaCore(cfg, num_envs=8)
    state, _ = env.reset(0)
    grids = np.asarray(state.obstacles)
    assert not all(np.array_equal(grids[0], grids[b]) for b in range(1, 8))


def test_coop_finish_full_scenario():
    """'nothing' mode: episode terminates exactly when every agent stands
    on its goal simultaneously; CSR/ISR reflect the final configuration."""
    cfg = GridConfig(
        seed=0, size=4, obs_radius=2, num_agents=2, map="....\n....\n....\n....",
        agents_xy=[[0, 0], [3, 3]], targets_xy=[[0, 2], [3, 1]],
        max_episode_steps=10, on_target="nothing",
    )
    env = PogemaCore(cfg, num_envs=1)
    state, obs = env.reset(0)
    # agent 0 walks right twice; agent 1 walks left twice
    for t in range(2):
        state, res, done, mets = env.step(state, jnp.asarray([[RIGHT, LEFT]]))
        if t == 0:
            assert not bool(done[0])
    assert bool(done[0])
    assert bool(res.terminated[0].all())
    assert float(mets["CSR"][0]) == 1.0
    assert float(mets["ISR"][0]) == 1.0
    assert float(mets["ep_length"][0]) == 2.0
    # no rewards in 'nothing' mode
    assert float(res.rewards.sum()) == 0.0
