"""Recurrent (GRU) family gate — makes the learner docstring's
"test-gated" claim true (VERDICT r2 next-round item 1 / ADVICE r2).

Gates:
1. ``__call__(obs)`` == ``step_from_state(state)`` (bf16-rounding
   equivalence, mirroring the feedforward family's pair);
2. epoch-0 replay equivalence: replaying the stored rollout sequence
   from the pre-rollout hidden state with the stored dones reproduces
   the rollout's log-probs and values exactly — the property the PPO
   update's loss replay relies on;
3. the GRU genuinely carries memory: different inputs at t=0 change the
   policy output at t=1 under identical t=1 inputs;
4. the recurrent PPO train step runs, is finite, and improves reward on
   a trivial task;
5. make_recurrent_train_many(k) == k sequential steps, bit-identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.models import RecurrentEmbedActorCritic, init_recurrent_params
from pogema_tpu.parallel import (
    PPOConfig,
    init_recurrent_train_state,
    make_recurrent_rollout_fn,
    make_recurrent_train_many,
    make_recurrent_train_step,
)
from pogema_tpu.parallel.rollout import log_prob_of


def _apply_cell(model):
    def apply_cell(params, grids, axy, txy, active, h):
        return model.apply(
            params, grids, axy, txy, active, h,
            method=RecurrentEmbedActorCritic.step_from_state,
        )

    return apply_cell


def _random_state(on_target="finish", num_envs=4, num_agents=6, size=12,
                  seed=0, steps=7):
    cfg = GridConfig(seed=seed, size=size, num_agents=num_agents,
                     obs_radius=2, max_episode_steps=32, on_target=on_target)
    core = PogemaCore(cfg, num_envs=num_envs)
    state, obs = core.reset(jax.random.key(seed))
    key = jax.random.key(seed + 1)
    for _ in range(steps):
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (num_envs, num_agents), 0, 5)
        state, res, _, _ = core.step(state, actions)
    return core, state, res.observations


@pytest.mark.parametrize("on_target", ["finish", "restart"])
def test_call_equals_step_from_state(on_target):
    core, state, obs = _random_state(on_target=on_target, seed=3)
    w = core.cfg.window
    model, params = init_recurrent_params(jax.random.key(0), w,
                                          embed=32, hidden=32)
    h = jax.random.normal(
        jax.random.key(7), (*state.active.shape, 32)
    ).astype(jnp.bfloat16)

    h_obs, logits_obs, value_obs = model.apply(params, obs, h)
    h_st, logits_st, value_st = model.apply(
        params, state.obstacles, state.agents_xy, state.targets_xy,
        state.active, h,
        method=RecurrentEmbedActorCritic.step_from_state,
    )
    np.testing.assert_allclose(np.asarray(logits_obs), np.asarray(logits_st),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(value_obs), np.asarray(value_st),
                               atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(h_obs, dtype=np.float32),
        np.asarray(h_st, dtype=np.float32), atol=2e-2,
    )


def test_rollout_replay_equivalence():
    """Replaying the stored (state, dones) sequence from the pre-rollout
    hidden reproduces the rollout's log-probs/values bit-for-bit — the
    exact mechanism make_recurrent_train_step's loss relies on."""
    cfg = GridConfig(seed=0, size=8, density=0.2, num_agents=3, obs_radius=2,
                     max_episode_steps=8, on_target="finish")
    core = PogemaCore(cfg, num_envs=8, auto_reset_mode="cached")
    model, params = init_recurrent_params(jax.random.key(0), core.cfg.window,
                                          embed=32, hidden=32)
    apply_cell = _apply_cell(model)
    state, _ = core.reset(jax.random.key(1), with_obs=False)
    h0 = model.initial_carry((8, cfg.num_agents))

    rollout = jax.jit(make_recurrent_rollout_fn(core, apply_cell, 20))
    env_state, h_last, _, traj = rollout(
        params, state, state, h0, jax.random.key(2)
    )
    assert bool(traj.env_dones.any()), "want episode ends inside the rollout"

    grids = state.obstacles  # static for the whole rollout (cached mode)

    def cell(h, xs):
        axy, txy, active, dones = xs
        new_h, logits, values = apply_cell(params, grids, axy, txy, active, h)
        new_h = jnp.where(dones[..., None], 0, new_h)
        return new_h, (logits, values)

    h_replay, (logits, values) = lax.scan(
        cell, h0, (traj.agents_xy, traj.targets_xy, traj.active, traj.dones)
    )
    log_probs = log_prob_of(logits, traj.actions)
    np.testing.assert_array_equal(np.asarray(log_probs),
                                  np.asarray(traj.log_probs))
    np.testing.assert_array_equal(np.asarray(values), np.asarray(traj.values))
    np.testing.assert_array_equal(
        np.asarray(h_replay, dtype=np.float32),
        np.asarray(h_last, dtype=np.float32),
    )


def test_gru_carries_memory_across_steps():
    """Different inputs at t=0 must change the t=1 output under identical
    t=1 inputs — the memory the feedforward family cannot have."""
    w = 5
    model, params = init_recurrent_params(jax.random.key(0), w,
                                          embed=32, hidden=32)
    apply_cell = _apply_cell(model)
    p = w + 3
    grids = jnp.zeros((1, p, p), jnp.uint8)
    axy = jnp.full((1, 1, 2), p // 2, jnp.int32)
    active = jnp.ones((1, 1), bool)
    h0 = model.initial_carry((1, 1))

    # t=0: goal east vs goal west.
    t_east = axy + jnp.array([[0, 2]], jnp.int32)
    t_west = axy - jnp.array([[0, 2]], jnp.int32)
    h_e, _, _ = apply_cell(params, grids, axy, t_east, active, h0)
    h_w, _, _ = apply_cell(params, grids, axy, t_west, active, h0)

    # t=1: identical inputs (goal on top of agent) for both histories.
    _, logits_e, _ = apply_cell(params, grids, axy, axy, active, h_e)
    _, logits_w, _ = apply_cell(params, grids, axy, axy, active, h_w)
    assert not np.allclose(np.asarray(logits_e), np.asarray(logits_w)), (
        "GRU output ignores its hidden state"
    )
    # ... and zeroed hidden (done) forgets: both histories collapse.
    z = jnp.zeros_like(h_e)
    _, logits_z1, _ = apply_cell(params, grids, axy, axy, active, z)
    _, logits_z2, _ = apply_cell(params, grids, axy, axy, active,
                                 jnp.zeros_like(h_w))
    np.testing.assert_array_equal(np.asarray(logits_z1), np.asarray(logits_z2))


def _recurrent_setup(num_envs=8, rollout_steps=8, max_episode_steps=16,
                     **ppo_kw):
    cfg = GridConfig(seed=0, size=8, density=0.2, num_agents=2, obs_radius=2,
                     max_episode_steps=max_episode_steps, on_target="restart")
    core = PogemaCore(cfg, num_envs=num_envs, auto_reset_mode="cached")
    model, params = init_recurrent_params(jax.random.key(0), core.cfg.window,
                                          embed=32, hidden=32)
    ppo = PPOConfig(rollout_steps=rollout_steps, epochs=1, minibatches=2,
                    **ppo_kw)
    ts, tx = init_recurrent_train_state(core, model, params, ppo,
                                        jax.random.key(1))
    return core, model, ppo, ts, tx


def test_recurrent_train_step_runs_and_is_finite():
    core, model, ppo, ts, tx = _recurrent_setup()
    train_step = jax.jit(make_recurrent_train_step(core, model, ppo, tx))
    for _ in range(3):
        ts, stats = train_step(ts)
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(float(stats["entropy"]))
    assert float(stats["entropy"]) > 0.0


def test_recurrent_minibatch_divisibility():
    cfg = GridConfig(seed=0, size=8, num_agents=2, obs_radius=2,
                     max_episode_steps=16, on_target="restart")
    core = PogemaCore(cfg, num_envs=6, auto_reset_mode="cached")
    model, _ = init_recurrent_params(jax.random.key(0), core.cfg.window,
                                     embed=32, hidden=32)
    with pytest.raises(ValueError, match="num_envs"):
        make_recurrent_train_step(core, model, PPOConfig(minibatches=4),
                                  tx=None)


def test_recurrent_learner_improves_on_trivial_task():
    cfg = GridConfig(seed=0, size=4, density=0.0, num_agents=1, obs_radius=2,
                     max_episode_steps=32, on_target="restart")
    core = PogemaCore(cfg, num_envs=32, auto_reset_mode="cached")
    model, params = init_recurrent_params(jax.random.key(0), core.cfg.window,
                                          embed=32, hidden=32)
    ppo = PPOConfig(rollout_steps=32, epochs=2, minibatches=2, lr=3e-3,
                    entropy_coef=0.003)
    ts, tx = init_recurrent_train_state(core, model, params, ppo,
                                        jax.random.key(1))
    train_step = jax.jit(make_recurrent_train_step(core, model, ppo, tx))
    first = None
    last = 0.0
    for i in range(60):
        ts, stats = train_step(ts)
        r = float(stats["reward_per_step"])
        if first is None:
            first = r
        last = 0.8 * last + 0.2 * r if i else r
    assert last > first + 0.02, (first, last)


def test_recurrent_train_many_equals_sequential_steps():
    core, model, ppo, ts, tx = _recurrent_setup()
    step = jax.jit(make_recurrent_train_step(core, model, ppo, tx))
    many = jax.jit(make_recurrent_train_many(core, model, ppo, tx, 3))

    ts_seq = ts
    losses = []
    for _ in range(3):
        ts_seq, stats = step(ts_seq)
        losses.append(float(stats["loss"]))
    ts_many, stats_many = many(ts)

    def as_np(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        ):
            x = jax.random.key_data(x)
        return np.asarray(x)

    for a, b in zip(jax.tree.leaves(ts_seq), jax.tree.leaves(ts_many)):
        assert np.array_equal(as_np(a), as_np(b))
    assert np.isclose(float(stats_many["loss"]), np.mean(losses), rtol=1e-5)
