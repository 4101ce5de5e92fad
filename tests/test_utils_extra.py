"""Validation util, profiling helpers, gymnasium registration."""

import gymnasium
import jax.numpy as jnp
import numpy as np

import pogema_tpu  # noqa: F401  (triggers gym registration)
from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.utils.profiling import ThroughputMeter, trace_region
from pogema_tpu.utils.validation import validate_state


def test_validate_state_clean_and_dirty():
    cfg_m = GridConfig(seed=0, size=8, density=0.2, num_agents=3, obs_radius=2,
                       max_episode_steps=8)
    core = PogemaCore(cfg_m, num_envs=2)
    state, _ = core.reset(0)
    assert validate_state(core.cfg, state) == []
    # corrupt: put agent 0 onto an obstacle border cell
    bad = state.replace(
        agents_xy=state.agents_xy.at[0, 0].set(jnp.asarray([0, 0]))
    )
    errs = validate_state(core.cfg, bad)
    assert errs and any("obstacle" in e or "border" in e for e in errs)


def test_throughput_meter():
    m = ThroughputMeter()
    m.add(1000)
    rate = m.lap()
    assert rate > 0


def test_trace_region_noop():
    with trace_region("test"):
        pass


def test_gymnasium_make():
    env = gymnasium.make(
        "Pogema-v0",
        grid_config=GridConfig(seed=0, size=6, num_agents=2, obs_radius=2,
                               max_episode_steps=4),
    )
    obs, infos = env.reset()
    assert len(obs) == 2
    obs, rew, term, trunc, infos = env.step([0, 0])
    assert len(rew) == 2
