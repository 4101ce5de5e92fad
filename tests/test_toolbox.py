"""Toolbox eval harness tests."""

import numpy as np

from pogema_tpu.toolbox import evaluate, evaluate_from_yaml, register_algo


def test_evaluate_astar_beats_random():
    envs = {"small": dict(size=8, density=0.2, num_agents=2, obs_radius=3,
                          max_episode_steps=32)}
    astar = evaluate(envs, algo="A*", seeds=[0, 1, 2])
    rand = evaluate(envs, algo="random", seeds=[0, 1, 2])
    assert astar["small"]["episodes"] == 3
    assert astar["small"]["ISR"] >= rand["small"]["ISR"]
    assert astar["small"]["ISR"] > 0.4


def test_evaluate_single_env_kwargs():
    out = evaluate(dict(size=6, num_agents=1, obs_radius=2, max_episode_steps=8),
                   algo="random", seeds=[0])
    assert "env" in out and "ep_length" in out["env"]


def test_custom_algo_and_yaml(tmp_path):
    class Still:
        def act(self, obs):
            return [0] * len(obs)

    register_algo("still", Still)
    yaml_path = tmp_path / "eval.yaml"
    yaml_path.write_text(
        """
algo: still
seeds: [0, 1]
environments:
  a: {size: 6, num_agents: 2, obs_radius: 2, max_episode_steps: 4}
  warehouse: {map_name: warehouse-16x16, num_agents: 2, obs_radius: 2, max_episode_steps: 4}
"""
    )
    out = evaluate_from_yaml(str(yaml_path))
    assert set(out) == {"a", "warehouse"}
    assert out["a"]["ISR"] == 0.0  # staying still never reaches goals
    assert out["a"]["ep_length"] == 4.0


def test_ppo_policy_roundtrip(tmp_path):
    """Save untrained params for both model families, reload through the
    toolbox PPO algo, and run an eval episode: exercises checkpoint
    save/load, model-family + size inference from the pytree, and the
    obs-based apply path (same function as training, tests/test_fused.py)."""
    import jax

    from pogema_tpu.models import (
        init_embed_params, init_params, init_recurrent_params,
    )
    from pogema_tpu.toolbox import PPOPolicy
    from pogema_tpu.utils.checkpoint import save_checkpoint

    window = 7  # obs_radius 3
    _, fused_params = init_embed_params(jax.random.key(0), window,
                                        embed=32, hidden=16)
    _, conv_params = init_params(jax.random.key(0), window,
                                 hidden=16, channels=8)
    _, rec_params = init_recurrent_params(jax.random.key(0), window,
                                          embed=32, hidden=16)
    envs = dict(size=6, num_agents=2, obs_radius=3, max_episode_steps=8)
    for name, params in [("fused", fused_params), ("conv", conv_params),
                         ("recurrent", rec_params)]:
        path = str(tmp_path / name)
        save_checkpoint(path, params)
        out = evaluate(envs, algo="PPO", seeds=[0],
                       algo_kwargs=dict(checkpoint=path))
        assert "ep_length" in out["env"]
        # Greedy policy is deterministic; sampled one still emits valid actions
        pol = PPOPolicy(path, temperature=1.0, seed=1)
        obs = [np.zeros((3, window, window), np.float32)] * 2
        acts = pol.act(obs)
        assert len(acts) == 2 and all(0 <= a < 5 for a in acts)

    # Recurrent policy memory plumbing: hidden state persists across
    # act() calls and clears on reset_states() (episode boundary).
    pol = PPOPolicy(str(tmp_path / "recurrent"))
    obs = [np.ones((3, window, window), np.float32)] * 2
    assert pol._h is None
    pol.act(obs)
    h1 = np.asarray(pol._h, np.float32)
    pol.act(obs)
    assert not np.array_equal(np.asarray(pol._h, np.float32), h1)
    pol.reset_states()
    assert pol._h is None
    # gym-style reset() alias and the explicit episode-boundary arg both
    # clear the carried state — callers that drive the policy directly
    # cannot leak GRU state across episodes.
    pol.act(obs)
    pol.reset()
    assert pol._h is None
    a_fresh = pol.act(obs, episode_start=True)
    pol.act(obs)  # advance state
    a_marked = pol.act(obs, episode_start=True)
    assert a_fresh == a_marked  # boundary arg == starting from scratch


def test_shipped_checkpoints_load_and_act():
    """The checkpoints shipped in the repo root (the round-5 config-E
    curriculum results among them) restore into PPOPolicy and emit valid
    actions — guards the artifacts the README's claims point at."""
    import os

    from pogema_tpu.toolbox import PPOPolicy

    window = 11  # obs_radius 5 (all shipped policies)
    shipped = [p for p in (".ckpt_maze256", ".ckpt_maze64",
                           ".ckpt_rec256b_ft", ".ckpt_rec128_ft")
               if os.path.isdir(os.path.join("/root/repo", p))]
    assert shipped, "no shipped checkpoints found"
    for name in shipped:
        pol = PPOPolicy(os.path.join("/root/repo", name))
        obs = [np.zeros((3, window, window), np.float32)] * 4
        acts = pol.act(obs)
        assert len(acts) == 4 and all(0 <= a < 5 for a in acts), name
