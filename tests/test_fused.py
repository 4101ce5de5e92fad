"""Fused (obs-free) learner path: the policy's first layer contracts
window one-hots directly against the embedding weights, so the obs
tensor never exists (VERDICT r1 item 1). These tests gate:

1. exactness: EmbedActorCritic.from_state(state) == __call__(observe(state))
   for every on_target mode (same bf16 weights, f32 accumulation — only
   summation order differs);
2. batched window ops == the per-env obs ops they fuse;
3. the fused PPO train step runs, improves reward on a trivial task, and
   matches its own static-map precondition;
4. sharded-vs-unsharded bit-exactness of the fused rollout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.models import EmbedActorCritic, init_embed_params
from pogema_tpu.ops import windows as W


def _random_state(on_target="finish", num_envs=4, num_agents=6, size=12,
                  seed=0, steps=7):
    cfg = GridConfig(seed=seed, size=size, num_agents=num_agents,
                     obs_radius=2, max_episode_steps=32, on_target=on_target)
    core = PogemaCore(cfg, num_envs=num_envs)
    state, obs = core.reset(jax.random.key(seed))
    key = jax.random.key(seed + 1)
    for _ in range(steps):  # wander so active masks / respawns vary
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (num_envs, num_agents), 0, 5)
        state, res, _, _ = core.step(state, actions)
    return core, state, res.observations


def test_batched_window_ops_match_unbatched():
    core, state, _ = _random_state()
    w = core.cfg.window
    per_env = jax.vmap(lambda g, xy: W.extract_windows(g, xy, w))(
        state.obstacles, state.agents_xy
    )
    batched = W.batched_extract_windows(
        state.obstacles, state.agents_xy, w, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(per_env), np.asarray(batched))

    per_env_a = jax.vmap(lambda xy, act: W.pairwise_agent_windows(xy, act, w))(
        state.agents_xy, state.active
    )
    batched_a = W.batched_pairwise_agent_windows(
        state.agents_xy, state.active, w, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(per_env_a), np.asarray(batched_a))


@pytest.mark.parametrize("on_target", ["finish", "nothing", "restart"])
def test_from_state_equals_obs_path(on_target):
    core, state, obs = _random_state(on_target=on_target, seed=3)
    w = core.cfg.window
    model, params = init_embed_params(jax.random.key(0), w, embed=64, hidden=64)

    logits_obs, value_obs = model.apply(params, obs)
    logits_st, value_st = model.apply(
        params, state.obstacles, state.agents_xy, state.targets_xy,
        state.active, method=EmbedActorCritic.from_state,
    )
    np.testing.assert_allclose(
        np.asarray(logits_obs), np.asarray(logits_st), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(value_obs), np.asarray(value_st), atol=2e-3
    )


@pytest.mark.parametrize("time_axis", [False, True])
def test_from_state_pre_equals_from_state(time_axis):
    """grid_embed + from_state_pre (obstacle term precomputed as a VALID
    conv of the grid) must match from_state up to bf16 rounding, with and
    without a leading time axis on the agent coords."""
    core, state, _ = _random_state(on_target="restart", seed=9)
    w = core.cfg.window
    model, params = init_embed_params(jax.random.key(0), w, embed=64, hidden=64)

    e_grid = model.apply(params, state.obstacles,
                         method=EmbedActorCritic.grid_embed)

    if time_axis:
        axy = jnp.stack([state.agents_xy, state.agents_xy + 0], axis=0)
        txy = jnp.stack([state.targets_xy, state.targets_xy], axis=0)
        act = jnp.stack([state.active, state.active], axis=0)
    else:
        axy, txy, act = state.agents_xy, state.targets_xy, state.active

    logits_pre, value_pre = model.apply(
        params, e_grid, axy, txy, act,
        method=EmbedActorCritic.from_state_pre,
    )
    logits_st, value_st = model.apply(
        params, state.obstacles, state.agents_xy, state.targets_xy,
        state.active, method=EmbedActorCritic.from_state,
    )
    if time_axis:
        np.testing.assert_array_equal(np.asarray(logits_pre[0]),
                                      np.asarray(logits_pre[1]))
        logits_pre, value_pre = logits_pre[0], value_pre[0]
    np.testing.assert_allclose(
        np.asarray(logits_st), np.asarray(logits_pre), atol=4e-3
    )
    np.testing.assert_allclose(
        np.asarray(value_st), np.asarray(value_pre), atol=4e-3
    )


def _fused_setup(on_target="restart", mode="regen", num_envs=8,
                 rollout_steps=8, max_episode_steps=16, **ppo_kw):
    from pogema_tpu.parallel import (
        PPOConfig, init_fused_train_state, make_fused_train_step,
    )

    cfg = GridConfig(seed=0, size=8, density=0.2, num_agents=2, obs_radius=2,
                     max_episode_steps=max_episode_steps, on_target=on_target)
    core = PogemaCore(cfg, num_envs=num_envs, auto_reset_mode=mode)
    model, params = init_embed_params(jax.random.key(0), core.cfg.window,
                                      embed=32, hidden=32)
    ppo = PPOConfig(rollout_steps=rollout_steps, epochs=1, minibatches=2,
                    **ppo_kw)
    ts, tx = init_fused_train_state(core, model, params, ppo, jax.random.key(1))
    return core, model, ppo, ts, tx, make_fused_train_step


def test_fused_train_step_runs_and_is_finite():
    core, model, ppo, ts, tx, make = _fused_setup()
    train_step = jax.jit(make(core, model, ppo, tx))
    for _ in range(3):
        ts, stats = train_step(ts)
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(float(stats["entropy"]))
    assert float(stats["entropy"]) > 0.0


def test_fused_static_map_precondition():
    from pogema_tpu.parallel import PPOConfig, make_fused_train_step

    # regen + finish can regenerate maps mid-rollout -> must refuse.
    cfg = GridConfig(seed=0, size=8, num_agents=2, obs_radius=2,
                     max_episode_steps=16, on_target="finish")
    core = PogemaCore(cfg, num_envs=4, auto_reset_mode="regen")
    model, _ = init_embed_params(jax.random.key(0), core.cfg.window,
                                 embed=32, hidden=32)
    with pytest.raises(ValueError, match="static per-rollout maps"):
        make_fused_train_step(core, model, PPOConfig(rollout_steps=8), tx=None)
    # cached mode is always fine.
    core2 = PogemaCore(cfg, num_envs=4, auto_reset_mode="cached")
    import optax

    make_fused_train_step(core2, model, PPOConfig(rollout_steps=8),
                          tx=optax.sgd(1e-3))
    # regen + restart + misaligned rollout -> refuse.
    cfg3 = cfg.model_copy(update={"on_target": "restart"})
    core3 = PogemaCore(cfg3, num_envs=4, auto_reset_mode="regen")
    with pytest.raises(ValueError, match="static per-rollout maps"):
        make_fused_train_step(core3, model, PPOConfig(rollout_steps=7), tx=None)


def test_fused_learner_improves_on_trivial_task():
    # 1 agent, tiny map, dense goal reward (restart): reward/step should
    # rise above the random-policy level within a few hundred updates.
    from pogema_tpu.parallel import (
        PPOConfig, init_fused_train_state, make_fused_train_step,
    )

    cfg = GridConfig(seed=0, size=4, density=0.0, num_agents=1, obs_radius=2,
                     max_episode_steps=32, on_target="restart")
    core = PogemaCore(cfg, num_envs=32, auto_reset_mode="cached")
    model, params = init_embed_params(jax.random.key(0), core.cfg.window,
                                      embed=32, hidden=32)
    ppo = PPOConfig(rollout_steps=32, epochs=2, minibatches=2, lr=3e-3,
                    entropy_coef=0.003)
    ts, tx = init_fused_train_state(core, model, params, ppo, jax.random.key(1))
    train_step = jax.jit(make_fused_train_step(core, model, ppo, tx))
    first = None
    last = 0.0
    for i in range(60):
        ts, stats = train_step(ts)
        r = float(stats["reward_per_step"])
        if first is None:
            first = r
        last = 0.8 * last + 0.2 * r if i else r
    assert last > first + 0.02, (first, last)


def test_fused_rollout_sharding_invariance():
    # Bit-identical trajectories with the env batch sharded over an
    # 8-device mesh vs unsharded (per-env PRNG keys; fused policy path).
    from pogema_tpu.parallel import (
        PPOConfig, init_fused_train_state, make_fused_train_step, make_mesh,
        shard_batch,
    )

    core, model, ppo, ts, tx, make = _fused_setup(num_envs=8)
    train_step = jax.jit(make(core, model, ppo, tx))
    ts1, stats1 = train_step(ts)

    mesh = make_mesh(data=len(jax.devices()), model=1)
    with mesh:
        ts_sh = ts.replace(
            env_state=shard_batch(ts.env_state, mesh),
            initial_env_state=shard_batch(ts.initial_env_state, mesh),
        )
        ts2, stats2 = train_step(ts_sh)
    np.testing.assert_array_equal(
        np.asarray(ts1.env_state.agents_xy), np.asarray(ts2.env_state.agents_xy)
    )
    assert np.isfinite(float(stats2["loss"]))


def test_fused_train_many_equals_sequential_steps():
    """make_fused_train_many(k): TrainState after one k-dispatch is
    bit-identical to k sequential train_step calls; stats are the k-mean
    (episodes_finished summed)."""
    from pogema_tpu.parallel import make_fused_train_many

    core, model, ppo, ts, tx, make = _fused_setup()
    step = jax.jit(make(core, model, ppo, tx))
    many = jax.jit(make_fused_train_many(core, model, ppo, tx, 3))

    ts_seq = ts
    losses = []
    for _ in range(3):
        ts_seq, stats = step(ts_seq)
        losses.append(float(stats["loss"]))
    ts_many, stats_many = many(ts)

    def as_np(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        return np.asarray(x)

    for a, b in zip(jax.tree.leaves(ts_seq), jax.tree.leaves(ts_many)):
        assert np.array_equal(as_np(a), as_np(b))
    assert np.isclose(float(stats_many["loss"]), np.mean(losses), rtol=1e-5)


def test_scan_minibatch_time_matches_one_shot_loss():
    """scan_minibatch_time=True (the 4096-env HBM fix: policy scanned
    over the minibatch time axis under remat) must compute the same
    'pre' train step as the one-shot loss: identical math up to float
    reduction order, so stats and updated params agree to tight
    tolerance over several steps."""
    core, model, ppo, ts, tx, make = _fused_setup(
        obstacle_path="pre", scan_minibatch_time=False)
    ppo_scan = ppo.replace(scan_minibatch_time=True)
    step = jax.jit(make(core, model, ppo, tx))
    step_scan = jax.jit(make(core, model, ppo_scan, tx))

    ts_a, ts_b = ts, ts
    for i in range(3):
        ts_a, stats_a = step(ts_a)
        ts_b, stats_b = step_scan(ts_b)
        for k in ("loss", "pg_loss", "v_loss", "entropy"):
            # pg_loss is a near-zero sum of mixed signs — reduction
            # order shifts it at ~1e-6 absolute (catastrophic
            # cancellation), so atol carries the comparison there.
            np.testing.assert_allclose(
                float(stats_a[k]), float(stats_b[k]), rtol=1e-3, atol=1e-5,
                err_msg=f"step {i} stat {k}")
    # Trajectories (integer env state) must be IDENTICAL: the rollout is
    # shared; only the loss reduction differs.
    np.testing.assert_array_equal(np.asarray(ts_a.env_state.agents_xy),
                                  np.asarray(ts_b.env_state.agents_xy))
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_flatten_with_path(ts_a.params)[0][:999],
        jax.tree_util.tree_flatten_with_path(ts_b.params)[0][:999],
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=2e-3, atol=2e-4,
            err_msg=f"param {pa}")
