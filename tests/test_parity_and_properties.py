"""Host parity generator + hypothesis property tests (SURVEY.md §4
implication (b): property tests of the vectorized step vs the trusted
NumPy oracle across randomized configs)."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.utils.oracle import OracleEnv
from pogema_tpu.utils.parity import host_generate, parity_config


def test_host_generate_valid_and_deterministic():
    cfg = GridConfig(seed=11, size=10, density=0.3, num_agents=4)
    g1, a1, t1 = host_generate(cfg)
    g2, a2, t2 = host_generate(cfg)
    assert (g1, a1, t1) == (g2, a2, t2)  # same seed, same draw
    grid = np.asarray(g1)
    for (ax, ay), (tx, ty) in zip(a1, t1):
        assert grid[ax, ay] == 0 and grid[tx, ty] == 0
        assert [ax, ay] != [tx, ty]
    assert len({tuple(a) for a in a1}) == 4
    assert len({tuple(t) for t in t1}) == 4


def test_parity_config_replays_in_engine():
    cfg = parity_config(GridConfig(seed=3, size=8, density=0.25, num_agents=3,
                                   obs_radius=2, max_episode_steps=8))
    core = PogemaCore(cfg, num_envs=1)
    state, obs = core.reset(0)
    r = core.cfg.obs_radius
    assert np.asarray(state.agents_xy[0]).tolist() == [
        [x + r, y + r] for x, y in cfg.agents_xy
    ]
    inner = np.asarray(state.obstacles[0])[r:-r, r:-r]
    assert inner.astype(int).tolist() == cfg.map


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 6),
    system=st.sampled_from(["priority", "block_both", "soft"]),
    on_target=st.sampled_from(["finish", "nothing"]),
)
def test_property_step_matches_oracle(seed, n, system, on_target):
    cfg_m = GridConfig(seed=seed, size=7, density=0.2, num_agents=n,
                       obs_radius=2, max_episode_steps=6,
                       collision_system=system, on_target=on_target)
    core = PogemaCore(cfg_m, num_envs=1)
    state, obs = core.reset(seed)
    oracle = OracleEnv(
        core.cfg,
        np.asarray(state.obstacles[0]),
        np.asarray(state.agents_xy[0]),
        np.asarray(state.targets_xy[0]),
    )
    rng = np.random.default_rng(seed)
    for _ in range(6):
        actions = rng.integers(0, 5, size=(1, n))
        state, res, done, _ = core.step(state, jnp.asarray(actions))
        rew, term, trunc, _ = oracle.step(actions[0])
        assert np.asarray(state.agents_xy[0]).tolist() == [
            list(t) for t in oracle.agents_xy
        ]
        assert np.asarray(res.rewards[0]).tolist() == rew
        assert np.asarray(res.terminated[0]).tolist() == term
