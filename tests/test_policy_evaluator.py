"""Batched on-device policy evaluator (parallel/evaluator.py): the
learned-policy counterpart of make_planner_evaluator."""

import jax
import numpy as np
import pytest

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.models import init_embed_params, init_recurrent_params
from pogema_tpu.parallel import make_policy_evaluator


def _core(on_target="restart", num_envs=16, max_episode_steps=24):
    cfg = GridConfig(seed=0, size=12, density=0.25, num_agents=4,
                     obs_radius=3, max_episode_steps=max_episode_steps,
                     on_target=on_target)
    return PogemaCore(cfg, num_envs=num_envs)


def test_greedy_evaluator_is_deterministic_and_matches_reset_world():
    core = _core(on_target="finish")
    model, params = init_embed_params(jax.random.key(0), core.cfg.window,
                                      embed=32, hidden=32)
    run = make_policy_evaluator(core, model, params)
    s1, m1 = run(jax.random.key(7))
    s2, m2 = run(jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(s1.agents_xy),
                                  np.asarray(s2.agents_xy))
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]))
    # Same key => same world as core.reset(key) (ladder comparability).
    ref_state, _ = core.reset(jax.random.key(7), with_obs=False)
    np.testing.assert_array_equal(np.asarray(s1.obstacles),
                                  np.asarray(ref_state.obstacles))
    assert set(m1) >= {"ISR", "CSR", "ep_length"}


def test_recurrent_evaluator_runs_lifelong():
    core = _core(on_target="restart")
    model, params = init_recurrent_params(jax.random.key(1), core.cfg.window,
                                          embed=32, hidden=32)
    run = make_policy_evaluator(core, model, params, greedy=False)
    state, mets = run(jax.random.key(3))
    assert "avg_throughput" in mets
    assert np.isfinite(np.asarray(mets["avg_throughput"])).all()
    # LifeLong never terminates early: every env runs to the time limit.
    np.testing.assert_array_equal(
        np.asarray(mets["ep_length"]),
        np.full(core.num_envs, core.cfg.max_episode_steps, np.float32))


def test_trained_policy_beats_random_policy():
    """A briefly-trained feedforward policy must outscore a random-init
    one under the evaluator — the end-to-end train->batched-eval loop."""
    import optax

    from pogema_tpu.parallel import (
        PPOConfig, init_fused_train_state, make_fused_train_step,
    )

    core = _core(on_target="restart", num_envs=64, max_episode_steps=32)
    model, params0 = init_embed_params(jax.random.key(0), core.cfg.window,
                                       embed=32, hidden=32)
    ppo = PPOConfig(rollout_steps=32, epochs=2, minibatches=2)
    ts, tx = init_fused_train_state(core, model, params0, ppo,
                                    jax.random.key(1))
    step = jax.jit(make_fused_train_step(core, model, ppo, tx))
    for _ in range(30):
        ts, stats = step(ts)

    run = make_policy_evaluator(core, model, ts.params)
    run0 = make_policy_evaluator(core, model, params0)
    seeds = [11, 12, 13]
    trained = np.mean([float(np.asarray(run(jax.random.key(s))[1]
                                        ["avg_throughput"]).mean())
                       for s in seeds])
    random_ = np.mean([float(np.asarray(run0(jax.random.key(s))[1]
                                        ["avg_throughput"]).mean())
                       for s in seeds])
    assert trained > random_, (trained, random_)
