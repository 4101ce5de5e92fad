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
