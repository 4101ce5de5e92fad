"""The external-framework (PyTorch) PPO example runs end-to-end against
PogemaVectorEnv: torch learner, our engine, NumPy boundary."""

import sys

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/examples")


def test_torch_ppo_smoke():
    import train_torch_ppo

    r = train_torch_ppo.main(
        ["--envs", "16", "--agents", "2", "--size", "8",
         "--obs-radius", "2", "--iters", "2", "--rollout-steps", "8",
         "--minibatches", "2", "--epochs", "1", "--cpu-env"])
    assert r == r  # finite (not NaN)
