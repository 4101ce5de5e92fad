"""Mesh/sharding/learner tests on the 8-device virtual CPU mesh
(SURVEY.md §4 implication (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.models import init_params, partition_params
from pogema_tpu.parallel import (
    PPOConfig,
    init_train_state,
    make_mesh,
    make_rollout_fn,
    make_train_step,
    shard_batch,
)


@pytest.fixture(scope="module")
def small_setup():
    cfg = GridConfig(seed=0, size=8, density=0.2, num_agents=2, obs_radius=2,
                     max_episode_steps=8)
    core = PogemaCore(cfg, num_envs=16)
    model, params = init_params(jax.random.key(0), cfg.obs_radius * 2 + 1,
                                hidden=32, channels=4)
    return cfg, core, model, params


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_data_axis(small_setup):
    _, core, _, _ = small_setup
    mesh = make_mesh(data=8)
    state, obs = core.reset(0)
    sharded = shard_batch(state, mesh)
    shard_info = sharded.agents_xy.sharding
    assert shard_info.spec[0] == "data"
    # stepping a sharded state works and keeps values identical
    actions = jnp.zeros((16, 2), jnp.int32)
    s1, r1, d1, m1 = core.step(state, actions)
    s2, r2, d2, m2 = core.step(sharded, actions)
    assert np.array_equal(np.asarray(s1.agents_xy), np.asarray(s2.agents_xy))
    assert np.array_equal(np.asarray(r1.rewards), np.asarray(r2.rewards))


def test_rollout_shapes(small_setup):
    cfg, core, model, params = small_setup
    rollout = make_rollout_fn(core, model.apply, num_steps=5)
    state, obs = core.reset(1)
    env_state, new_obs, key, traj = jax.jit(rollout)(
        params, state, state, obs, jax.random.key(2)
    )
    assert traj.obs.shape == (5, 16, 2, 3, 5, 5)
    assert traj.actions.shape == (5, 16, 2)
    assert traj.rewards.dtype == jnp.float32
    assert traj.env_dones.shape == (5, 16)
    assert bool(jnp.all((traj.actions >= 0) & (traj.actions < 5)))


def test_ppo_train_step_runs_and_learns_shapes(small_setup):
    cfg, core, model, params = small_setup
    ppo = PPOConfig(rollout_steps=4, epochs=1, minibatches=2)
    ts, tx = init_train_state(core, model, params, ppo, jax.random.key(3))
    train_step = jax.jit(make_train_step(core, model, ppo, tx))
    ts2, stats = train_step(ts)
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(float(stats["entropy"]))
    # params actually changed
    leaves1 = jax.tree.leaves(ts.params)
    leaves2 = jax.tree.leaves(ts2.params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves1, leaves2))
    # second step composes
    ts3, stats3 = train_step(ts2)
    assert np.isfinite(float(stats3["loss"]))


def test_train_step_sharded_over_mesh(small_setup):
    cfg, core, model, params = small_setup
    mesh = make_mesh(data=4, model=2)
    ppo = PPOConfig(rollout_steps=2, epochs=1, minibatches=2)
    with mesh:
        p = partition_params(params, mesh)
        # trunk kernel is sharded over 'model'
        trunk = p["params"]["trunk"]["kernel"]
        assert trunk.sharding.spec[-1] == "model"
        ts, tx = init_train_state(core, model, p, ppo, jax.random.key(4))
        ts = ts.replace(
            env_state=shard_batch(ts.env_state, mesh),
            initial_env_state=shard_batch(ts.initial_env_state, mesh),
            obs=shard_batch(ts.obs, mesh),
        )
        train_step = jax.jit(make_train_step(core, model, ppo, tx))
        ts2, stats = train_step(ts)
        assert np.isfinite(float(stats["loss"]))


def test_recurrent_train_step_sharded():
    """The RECURRENT learner — the path every shipped checkpoint trains
    on — under mesh sharding (VERDICT r4 item 4): (a) data-axis
    sharding reproduces the unsharded step's stats to f32 tolerance;
    (b) a data×model mesh (GRU gate kernels column-parallel, carried h
    'model'-sharded) compiles and runs finite."""
    from pogema_tpu.models import init_recurrent_params, partition_params
    from pogema_tpu.parallel import (
        init_recurrent_train_state, make_recurrent_train_step,
    )

    cfg = GridConfig(seed=0, size=8, density=0.2, num_agents=2,
                     obs_radius=2, max_episode_steps=8,
                     on_target="restart")
    core = PogemaCore(cfg, num_envs=16, auto_reset_mode="regen")
    model, params = init_recurrent_params(jax.random.key(0), 5,
                                          embed=32, hidden=32)
    ppo = PPOConfig(rollout_steps=4, epochs=2, minibatches=2)

    def one_step(mesh):
        if mesh is None:
            p = params
        else:
            p = partition_params(params, mesh)
        ts, tx = init_recurrent_train_state(core, model, p, ppo,
                                            jax.random.key(1))
        if mesh is not None:
            from pogema_tpu.parallel import shard_batch

            ts = ts.replace(
                env_state=shard_batch(ts.env_state, mesh),
                initial_env_state=shard_batch(ts.initial_env_state, mesh),
                h=shard_batch(ts.h, mesh),
            )
        train_step = jax.jit(make_recurrent_train_step(core, model, ppo, tx))
        if mesh is None:
            ts2, stats = train_step(ts)
        else:
            with mesh:
                ts2, stats = train_step(ts)
        return ts2, {k: float(v) for k, v in stats.items()}

    ts_ref, stats_ref = one_step(None)

    # (a) pure data-parallel: same program, same numbers
    ts_dp, stats_dp = one_step(make_mesh(data=8))
    for k in stats_ref:
        assert np.isclose(stats_ref[k], stats_dp[k], rtol=1e-5, atol=1e-6), (
            k, stats_ref[k], stats_dp[k])
    for a, b in zip(jax.tree.leaves(ts_ref.params),
                    jax.tree.leaves(ts_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # the GRU hidden state carried out of the rollout matches too
    np.testing.assert_allclose(
        np.asarray(ts_ref.h, dtype=np.float32),
        np.asarray(ts_dp.h, dtype=np.float32), rtol=2e-2, atol=2e-3)

    # (b) data×model tensor parallelism compiles and runs finite
    mesh_tp = make_mesh(data=4, model=2)
    with mesh_tp:
        p = partition_params(params, mesh_tp)
        gk = p["params"]["gru"]["in"]["kernel"]
        assert gk.sharding.spec[-1] == "model"
    _, stats_tp = one_step(mesh_tp)
    assert all(np.isfinite(v) for v in stats_tp.values()), stats_tp


def test_graft_entry_and_dryrun():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    logits, value = jax.jit(fn)(*args)
    assert logits.shape[-1] == 5
    mod.dryrun_multichip(8)


def test_sharded_rollout_bit_exact(small_setup):
    """Trajectories must not depend on the sharding layout (SURVEY.md §7
    hard part #5: per-env keys make device placement irrelevant)."""
    cfg, core, model, params = small_setup
    mesh = make_mesh(data=8)
    rollout = make_rollout_fn(core, model.apply, num_steps=6)
    state, obs = core.reset(5)
    _, _, _, traj_plain = jax.jit(rollout)(params, state, state, obs,
                                           jax.random.key(7))
    with mesh:
        s_sh = shard_batch(state, mesh)
        o_sh = shard_batch(obs, mesh)
        _, _, _, traj_sh = jax.jit(rollout)(params, s_sh, s_sh, o_sh,
                                            jax.random.key(7))
    for a, b in zip(jax.tree.leaves(traj_plain), jax.tree.leaves(traj_sh)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_scaling_harness_smoke(small_setup):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scaling", "/root/repo/benchmarks/scaling.py"
    )
    scaling = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(scaling)
    _, core, _, _ = small_setup
    rate = scaling.measure(core, 16, 2, steps=3)
    assert rate > 0
    mesh = make_mesh(data=8)
    with mesh:
        rate_sh = scaling.measure(core, 16, 2, steps=3, mesh=mesh)
    assert rate_sh > 0


def test_epoch_mix_is_varying_partition():
    """_epoch_mix must (a) produce a valid partition (every row exactly
    once), (b) put minibatch on axis 1, and (c) actually VARY the
    unordered partition across keys — the property the pure random roll
    silently lacked (its partition is the constant residue-class family
    for every shift)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pogema_tpu.parallel.learner import _epoch_mix

    n, m = 64, 4
    rows = jnp.arange(n)
    partitions = set()
    for s in range(12):
        mix = _epoch_mix(jax.random.key(s), n, m)
        out = np.asarray(jax.jit(mix)(rows))  # [mb, M]
        assert out.shape == (n // m, m)
        assert sorted(out.reshape(-1).tolist()) == list(range(n))
        partitions.add(
            frozenset(frozenset(out[:, j].tolist()) for j in range(m))
        )
    assert len(partitions) > 1, "partition never varies across epochs"
