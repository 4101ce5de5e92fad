"""Generate golden-trajectory fixtures (SURVEY.md §7 step 0 / §4).

Until the real reference is reachable (zero egress), the fixtures are
recorded from THIS engine on CPU and pin the engine against itself:
any future rewrite of the hot path (e.g. Pallas kernels) must reproduce
these trajectories bit-exactly. When network access exists, regenerate
the same scenarios from a pip-installed pogema to upgrade them into true
reference-parity fixtures.

Run: python tests/make_fixtures.py   (writes tests/fixtures/*.json)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pogema_tpu import GridConfig, PogemaCore

SCENARIOS = {
    "finish_priority": dict(seed=7, size=10, density=0.25, num_agents=5,
                            obs_radius=3, max_episode_steps=24,
                            collision_system="priority", on_target="finish"),
    "finish_block_both": dict(seed=8, size=10, density=0.25, num_agents=5,
                              obs_radius=3, max_episode_steps=24,
                              collision_system="block_both", on_target="finish"),
    "soft_nothing": dict(seed=9, size=10, density=0.25, num_agents=5,
                         obs_radius=3, max_episode_steps=24,
                         collision_system="soft", on_target="nothing"),
    "lifelong": dict(seed=10, size=10, density=0.2, num_agents=4,
                     obs_radius=3, max_episode_steps=24,
                     collision_system="priority", on_target="restart"),
}


def record(name, cfg_kwargs):
    cfg = GridConfig(**cfg_kwargs)
    core = PogemaCore(cfg, num_envs=1)
    state, obs = core.reset(12345)
    rng = np.random.default_rng(99)
    steps = []
    data = {
        "config": cfg_kwargs,
        "reset_key_seed": 12345,
        "obstacles": np.asarray(state.obstacles[0]).tolist(),
        "agents_xy": np.asarray(state.agents_xy[0]).tolist(),
        "targets_xy": np.asarray(state.targets_xy[0]).tolist(),
        "obs_checksum": float(np.asarray(obs).sum()),
        "steps": steps,
    }
    for t in range(cfg.max_episode_steps):
        actions = rng.integers(0, 5, size=(1, cfg.num_agents))
        state, res, done, mets = core.step(state, jnp.asarray(actions))
        steps.append({
            "actions": actions[0].tolist(),
            "agents_xy": np.asarray(state.agents_xy[0]).tolist(),
            "targets_xy": np.asarray(state.targets_xy[0]).tolist(),
            "rewards": np.asarray(res.rewards[0]).tolist(),
            "terminated": np.asarray(res.terminated[0]).astype(int).tolist(),
            "truncated": np.asarray(res.truncated[0]).astype(int).tolist(),
            "obs_checksum": float(np.asarray(res.observations[0]).sum()),
        })
        if bool(done[0]):
            break
    data["metrics"] = {k: float(v[0]) for k, v in mets.items()}
    return data


def main():
    outdir = os.path.join(os.path.dirname(__file__), "fixtures")
    os.makedirs(outdir, exist_ok=True)
    for name, kwargs in SCENARIOS.items():
        path = os.path.join(outdir, f"{name}.json")
        with open(path, "w") as f:
            json.dump(record(name, kwargs), f)
        print("wrote", path)


if __name__ == "__main__":
    main()
