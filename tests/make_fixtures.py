"""Generate golden-trajectory fixtures (SURVEY.md §7 step 0 / §4).

Two modes:

* default — fixtures are recorded from THIS engine on CPU and pin the
  engine against itself: refactor armor (any rewrite of the hot path must
  reproduce these bit-exactly), NOT reference-parity evidence.
* ``--from-reference`` — records the same scenarios from a pip-installed
  upstream ``pogema`` (requires network to install; PARITY_RISKS.md is
  the day-1 checklist). Reference fixtures carry the explicit map and
  placements so the replay test feeds our engine the exact same world and
  compares trajectories step by step; they set ``source: "reference"``
  and a ``compare`` list (LifeLong respawns draw from a different RNG, so
  that scenario pins positions only — respawn distribution is pinned
  separately, PARITY_RISKS.md row 10).

Run: python tests/make_fixtures.py [--from-reference]
     (writes tests/fixtures/*.json)
"""

import argparse
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

FULL_COMPARE = ["agents_xy", "targets_xy", "rewards", "terminated", "obs_checksum"]


def record(name, cfg_kwargs):
    cfg = GridConfig(**cfg_kwargs)
    core = PogemaCore(cfg, num_envs=1)
    state, obs = core.reset(12345)
    rng = np.random.default_rng(99)
    steps = []
    data = {
        "source": "engine",
        "compare": FULL_COMPARE,
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


def record_from_reference(name, cfg_kwargs):
    """Record the scenario from upstream pogema (PARITY_RISKS.md day-1).

    The reference's map/placement RNG differs from ours, so the fixture
    carries the world explicitly (logical-coords map + agents_xy +
    targets_xy) and the replay test rebuilds it via
    ``GridConfig(map=..., agents_xy=..., targets_xy=...)``.
    """
    try:
        import pogema as ref  # noqa: F401  (pip install pogema)
        from pogema import GridConfig as RefGridConfig, pogema_v0 as ref_v0
    except ImportError as e:
        raise SystemExit(
            "--from-reference needs the upstream package: pip install pogema"
        ) from e

    ref_env = ref_v0(grid_config=RefGridConfig(**cfg_kwargs))
    obs, infos = ref_env.reset(seed=cfg_kwargs.get("seed"))
    grid = ref_env.unwrapped.grid if hasattr(ref_env.unwrapped, "grid") else ref_env.unwrapped
    obstacles = np.asarray(grid.get_obstacles(ignore_borders=True), np.uint8)
    agents_xy = [list(map(int, p)) for p in grid.get_agents_xy(ignore_borders=True)]
    targets_xy = [list(map(int, p)) for p in grid.get_targets_xy(ignore_borders=True)]

    lifelong = cfg_kwargs.get("on_target") == "restart"
    rng = np.random.default_rng(99)
    steps = []
    data = {
        "source": "reference",
        # LifeLong respawns use the reference's private RNG stream — pin
        # collision-resolved movement only (PARITY_RISKS.md row 10).
        "compare": ["agents_xy"] if lifelong else
                   ["agents_xy", "targets_xy", "rewards", "terminated"],
        "config": cfg_kwargs,
        "map": obstacles.tolist(),
        "agents_xy": agents_xy,
        "targets_xy": targets_xy,
        "steps": steps,
    }
    n = cfg_kwargs["num_agents"]
    for t in range(cfg_kwargs["max_episode_steps"]):
        actions = rng.integers(0, 5, size=n)
        obs, rewards, term, trunc, infos = ref_env.step(actions.tolist())
        steps.append({
            "actions": actions.tolist(),
            "agents_xy": [list(map(int, p))
                          for p in grid.get_agents_xy(ignore_borders=True)],
            "targets_xy": [list(map(int, p))
                           for p in grid.get_targets_xy(ignore_borders=True)],
            "rewards": [float(r) for r in rewards],
            "terminated": [int(bool(x)) for x in term],
            "truncated": [int(bool(x)) for x in trunc],
        })
        if all(bool(a) or bool(b) for a, b in zip(term, trunc)):
            break
    data["metrics"] = dict(infos[0].get("metrics", {}))
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-reference", action="store_true",
                    help="record from pip-installed upstream pogema "
                         "(true parity fixtures; see PARITY_RISKS.md)")
    args = ap.parse_args()
    outdir = os.path.join(os.path.dirname(__file__), "fixtures")
    os.makedirs(outdir, exist_ok=True)
    recorder = record_from_reference if args.from_reference else record
    for name, kwargs in SCENARIOS.items():
        path = os.path.join(outdir, f"{name}.json")
        with open(path, "w") as f:
            json.dump(recorder(name, kwargs), f)
        print("wrote", path)


if __name__ == "__main__":
    main()
