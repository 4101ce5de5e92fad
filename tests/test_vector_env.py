"""PogemaVectorEnv — the gymnasium.vector adapter external (non-JAX)
frameworks consume: NumPy in/out, B envs per call, SAME_STEP auto-reset,
selectable obs_layout. Gated against PogemaCore driven directly."""

import numpy as np
import pytest

from pogema_tpu import GridConfig, PogemaCore, PogemaVectorEnv

CFG = dict(seed=7, size=8, density=0.2, num_agents=3, obs_radius=2,
           max_episode_steps=16)


def _drive(env, steps, seed_actions=0):
    rng = np.random.default_rng(seed_actions)
    obs, _ = env.reset()
    outs = [obs]
    for _ in range(steps):
        acts = rng.integers(0, 5, size=env.num_envs)
        obs, rew, term, trunc, infos = env.step(acts)
        outs.append((obs, rew, term, trunc, infos))
    return outs


def test_spaces_and_shapes():
    env = PogemaVectorEnv(GridConfig(**CFG), num_vec_envs=4)
    w = 2 * CFG["obs_radius"] + 1
    assert env.num_envs == 4 * CFG["num_agents"]
    assert env.single_observation_space.shape == (3, w, w)
    assert env.single_action_space.n == 5
    obs, infos = env.reset()
    assert obs.shape == (env.num_envs, 3, w, w) and obs.dtype == np.float32
    acts = np.zeros(env.num_envs, np.int64)
    obs, rew, term, trunc, infos = env.step(acts)
    assert obs.shape == (env.num_envs, 3, w, w)
    for a in (rew, term, trunc):
        assert a.shape == (env.num_envs,)
    assert rew.dtype == np.float32
    assert term.dtype == bool and trunc.dtype == bool


def test_packed_layout_is_bit_exact_reshape():
    grid = PogemaVectorEnv(GridConfig(**CFG), num_vec_envs=4)
    packed = PogemaVectorEnv(GridConfig(**CFG), num_vec_envs=4,
                             obs_layout="packed")
    w = 2 * CFG["obs_radius"] + 1
    assert packed.single_observation_space.shape == (3 * w * w,)
    og, _ = grid.reset()
    op, _ = packed.reset()
    np.testing.assert_array_equal(og.reshape(op.shape), op)
    rng = np.random.default_rng(3)
    for _ in range(8):
        acts = rng.integers(0, 5, size=grid.num_envs)
        og = grid.step(acts)[0]
        op = packed.step(acts)[0]
        np.testing.assert_array_equal(og.reshape(op.shape), op)


def test_matches_pogema_core_directly():
    """Same seed, same actions -> identical obs/rewards as driving
    PogemaCore.step_autoreset by hand (the adapter adds no semantics)."""
    B = 4
    env = PogemaVectorEnv(GridConfig(**CFG), num_vec_envs=B)
    core = PogemaCore(GridConfig(**CFG), num_envs=B)
    state, obs_c = core.reset(core.make_key(CFG["seed"]))
    init = state
    obs_v, _ = env.reset()
    np.testing.assert_array_equal(obs_v, np.asarray(obs_c).reshape(obs_v.shape))
    rng = np.random.default_rng(0)
    for _ in range(20):
        acts = rng.integers(0, 5, size=env.num_envs)
        obs_v, rew_v, term_v, trunc_v, _ = env.step(acts)
        state, obs_c, res, done, _ = core.step_autoreset(
            state, init, acts.reshape(B, -1).astype(np.int32))
        np.testing.assert_array_equal(
            obs_v, np.asarray(obs_c).reshape(obs_v.shape))
        np.testing.assert_array_equal(
            rew_v, np.asarray(res.rewards, np.float32).reshape(-1))
        np.testing.assert_array_equal(
            term_v, np.asarray(res.terminated).reshape(-1))


def test_same_step_autoreset_and_final_obs():
    """Episodes truncate at max_episode_steps; the step that ends them
    returns next-episode obs (== the cached reset obs) with the terminal
    obs + metrics in infos under the gymnasium SAME_STEP masks."""
    B = 3
    env = PogemaVectorEnv(GridConfig(**CFG), num_vec_envs=B)
    obs0, _ = env.reset()
    rng = np.random.default_rng(1)
    saw_done = False
    for t in range(1, CFG["max_episode_steps"] + 1):
        acts = rng.integers(0, 5, size=env.num_envs)
        obs, rew, term, trunc, infos = env.step(acts)
        if "_final_obs" in infos:
            saw_done = True
            mask = infos["_final_obs"]
            assert mask.shape == (env.num_envs,)
            assert infos["final_obs"].shape == obs.shape
            assert infos["_metrics"] is mask or np.array_equal(
                infos["_metrics"], mask)
            assert "metrics/ep_length" in infos
            assert "metrics/ISR" in infos and "metrics/CSR" in infos
            # ended slots: ep_length == t (all envs end together at the
            # time limit unless they solved earlier)
            assert (infos["metrics/ep_length"][mask] >= 1).all()
            # cached auto-reset: the post-done obs replay the reset obs
            # (same maps/placements each episode in 'cached' mode)
            done_slots = np.nonzero(mask)[0]
            np.testing.assert_array_equal(obs[done_slots], obs0[done_slots])
    assert saw_done  # the time limit guarantees at least one boundary


def test_lifelong_metrics_key():
    env = PogemaVectorEnv(
        GridConfig(**{**CFG, "on_target": "restart"}), num_vec_envs=2)
    env.reset()
    rng = np.random.default_rng(0)
    infos = {}
    for _ in range(CFG["max_episode_steps"]):
        *_, infos = env.step(rng.integers(0, 5, size=env.num_envs))
    assert "metrics/avg_throughput" in infos


def test_reset_seed_reproducibility():
    env = PogemaVectorEnv(GridConfig(**CFG), num_vec_envs=2)
    o1, _ = env.reset(seed=123)
    o2, _ = env.reset(seed=123)
    np.testing.assert_array_equal(o1, o2)
    o3, _ = env.reset()  # episode-indexed fold-in: new episode differs
    assert not np.array_equal(o1, o3)


def test_mapf_obs_type_rejected():
    with pytest.raises(ValueError, match="global"):
        PogemaVectorEnv(GridConfig(**{**CFG, "observation_type": "MAPF"}))


def test_pomapf_dict_obs():
    """POMAPF batches into a Dict space: per-agent window/coordinate
    leaves flat over agent slots, float windows in the host dtype,
    int32 coordinates, SAME_STEP final_obs masked per leaf."""
    import gymnasium

    B = 3
    env = PogemaVectorEnv(
        GridConfig(**{**CFG, "observation_type": "POMAPF"}), num_vec_envs=B)
    w = 2 * CFG["obs_radius"] + 1
    assert isinstance(env.single_observation_space, gymnasium.spaces.Dict)
    obs, _ = env.reset(seed=11)
    assert set(obs) == {"obstacles", "agents", "xy", "target_xy"}
    assert obs["obstacles"].shape == (env.num_envs, w, w)
    assert obs["obstacles"].dtype == np.float32
    assert obs["xy"].shape == (env.num_envs, 2)
    assert obs["xy"].dtype == np.int32
    # active agents' coordinates are logical (unpadded) grid coords
    assert (obs["xy"] >= 0).all() and (obs["xy"] < CFG["size"]).all()
    for i in range(env.num_envs):
        assert env.single_observation_space.contains(
            {k: v[i] for k, v in obs.items()})
    rng = np.random.default_rng(2)
    saw_done = False
    for _ in range(CFG["max_episode_steps"]):
        obs, rew, term, trunc, infos = env.step(
            rng.integers(0, 5, size=env.num_envs))
        assert set(obs) == {"obstacles", "agents", "xy", "target_xy"}
        if "_final_obs" in infos:
            saw_done = True
            mask = infos["_final_obs"]
            fin = infos["final_obs"]
            assert set(fin) == set(obs)
            for k in fin:
                assert fin[k].shape == obs[k].shape
                assert (fin[k][~mask] == 0).all()
    assert saw_done


def test_pomapf_matches_core_directly():
    """Adapter POMAPF leaves == PogemaCore driven directly."""
    import jax

    gc = GridConfig(**{**CFG, "observation_type": "POMAPF"})
    env = PogemaVectorEnv(gc, num_vec_envs=2)
    core = PogemaCore(gc, num_envs=2)
    obs_v, _ = env.reset(seed=9)
    state, obs_c = core.reset(core.make_key(9))
    state0 = state
    obs_c = jax.device_get(obs_c)
    for k in obs_v:
        np.testing.assert_array_equal(
            obs_v[k], np.asarray(obs_c[k]).reshape(obs_v[k].shape))
    rng = np.random.default_rng(4)
    for _ in range(4):
        acts = rng.integers(0, 5, size=env.num_envs)
        obs_v = env.step(acts)[0]
        state, obs_c, *_ = core.step_autoreset(
            state, state0, acts.reshape(2, -1).astype(np.int32))
        obs_c = jax.device_get(obs_c)
        for k in obs_v:
            np.testing.assert_array_equal(
                obs_v[k], np.asarray(obs_c[k]).reshape(obs_v[k].shape))


def test_sample_factory_batched_env():
    from pogema_tpu.integrations.sample_factory import SampleFactoryBatchedEnv

    env = SampleFactoryBatchedEnv(GridConfig(**CFG), num_vec_envs=2,
                                  obs_layout="packed")
    assert env.is_multiagent and env.num_agents == 2 * CFG["num_agents"]
    w = 2 * CFG["obs_radius"] + 1
    assert env.observation_space.shape == (3 * w * w,)
    obs, infos = env.reset(seed=5)
    assert isinstance(obs, list) and len(obs) == env.num_agents
    rng = np.random.default_rng(0)
    got_stats = False
    for _ in range(CFG["max_episode_steps"]):
        obs, rew, term, trunc, infos = env.step(
            rng.integers(0, 5, size=env.num_agents))
        assert len(obs) == len(rew) == len(term) == len(infos) == env.num_agents
        for info in infos:
            if "episode_extra_stats" in info:
                got_stats = True
                assert "ep_length" in info["episode_extra_stats"]
    assert got_stats


def test_sample_factory_pomapf_dict_obs():
    from pogema_tpu.integrations.sample_factory import SampleFactoryBatchedEnv

    env = SampleFactoryBatchedEnv(
        GridConfig(**{**CFG, "observation_type": "POMAPF"}), num_vec_envs=2)
    obs, infos = env.reset(seed=5)
    assert isinstance(obs, list) and len(obs) == env.num_agents
    assert isinstance(obs[0], dict)
    assert set(obs[0]) == {"obstacles", "agents", "xy", "target_xy"}
    w = 2 * CFG["obs_radius"] + 1
    assert obs[0]["obstacles"].shape == (w, w)
    rng = np.random.default_rng(0)
    obs, rew, term, trunc, infos = env.step(
        rng.integers(0, 5, size=env.num_agents))
    assert len(obs) == env.num_agents and isinstance(obs[0], dict)
