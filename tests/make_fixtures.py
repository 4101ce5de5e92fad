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
    # Dense-interaction pins at N=16 (PARITY_RISKS rows 1, 3: tie-break
    # and block-chain semantics only bite when many agents contend).
    "block_both_n16": dict(seed=21, size=14, density=0.3, num_agents=16,
                           obs_radius=3, max_episode_steps=32,
                           collision_system="block_both",
                           on_target="finish"),
    "soft_n16": dict(seed=22, size=14, density=0.3, num_agents=16,
                     obs_radius=3, max_episode_steps=32,
                     collision_system="soft", on_target="restart"),
    # Letter-coded string map (PARITY_RISKS row 4): agents A-D with
    # matching goals a-d; num_agents is inferred from the letters.
    "letter_map": dict(seed=23, obs_radius=3, max_episode_steps=24,
                       collision_system="priority", on_target="finish",
                       map=(
                           "A...#....a\n"
                           ".#..#..#..\n"
                           "..B....#.b\n"
                           "....##....\n"
                           ".C...#...c\n"
                           "..........\n"
                           ".#...#.#..\n"
                           "D........d\n"
                           "...#......\n"
                           ".........."
                       )),
}

# Scenarios recorded through the pogema_v0 rim: pin the POMAPF/MAPF obs
# DICT surface (PARITY_RISKS row 7 key sets + rows 6/8 via per-key
# checksums), which PogemaCore fixtures never see.
RIM_SCENARIOS = {
    "rim_pomapf": dict(seed=31, size=10, density=0.25, num_agents=6,
                       obs_radius=3, max_episode_steps=24,
                       observation_type="POMAPF", on_target="finish"),
    "rim_mapf": dict(seed=32, size=10, density=0.25, num_agents=6,
                     obs_radius=3, max_episode_steps=24,
                     observation_type="MAPF", on_target="restart"),
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


def _obs_key_checksums(obs_dicts):
    """Per-key float checksums summed over agents, key-sorted: pins both
    the key SET (PARITY_RISKS row 7) and the values (rows 6/8)."""
    keys = sorted(obs_dicts[0].keys())
    return {k: float(sum(np.asarray(o[k], np.float64).sum()
                         for o in obs_dicts)) for k in keys}


def record_rim(name, cfg_kwargs, make_env=None):
    """Record through the gym rim (pogema_v0): obs dict key checksums +
    positions/rewards per step. ``make_env`` swaps in the upstream
    factory for --from-reference (identical recording shape, so the
    replay compares ours against theirs field for field; upstream's
    world RNG differs, hence the explicit map/placement carry-over)."""
    from pogema_tpu import pogema_v0 as our_v0

    if make_env is None:
        env = our_v0(GridConfig(**cfg_kwargs))
        source = "engine-rim"
    else:
        env, cfg_kwargs = make_env(cfg_kwargs)
        source = "reference-rim"
    obs, infos = env.reset(seed=cfg_kwargs.get("seed"))
    u = env.unwrapped
    grid = u if hasattr(u, "get_obstacles") else u.grid
    obstacles = np.asarray(grid.get_obstacles(ignore_borders=True), np.uint8)
    rng = np.random.default_rng(99)
    n = len(obs)
    steps = []
    # Reference LifeLong respawns draw from upstream's private RNG, so
    # target-dependent per-step fields (rewards, obs checksums) cannot
    # be pinned — movement and termination can (PARITY_RISKS row 10).
    lifelong_ref = (source == "reference-rim"
                    and cfg_kwargs.get("on_target") == "restart")
    compare = (["agents_xy", "terminated", "truncated"] if lifelong_ref else
               ["agents_xy", "rewards", "terminated", "truncated",
                "obs_checksums"])
    data = {
        "source": source,
        "compare": compare,
        "config": cfg_kwargs,
        "map": obstacles.tolist(),
        "agents_xy": [list(map(int, p))
                      for p in grid.get_agents_xy(ignore_borders=True)],
        "targets_xy": [list(map(int, p))
                       for p in grid.get_targets_xy(ignore_borders=True)],
        "obs_keys": sorted(obs[0].keys()),
        "obs_checksums": _obs_key_checksums(obs),
        "steps": steps,
    }
    for t in range(cfg_kwargs["max_episode_steps"]):
        actions = rng.integers(0, 5, size=n)
        obs, rewards, term, trunc, infos = env.step(actions.tolist())
        steps.append({
            "actions": actions.tolist(),
            "agents_xy": [list(map(int, p))
                          for p in grid.get_agents_xy(ignore_borders=True)],
            "rewards": [float(r) for r in rewards],
            "terminated": [int(bool(x)) for x in term],
            "truncated": [int(bool(x)) for x in trunc],
            "obs_checksums": _obs_key_checksums(obs),
        })
        if all(bool(a) or bool(b) for a, b in zip(term, trunc)):
            break
    return data


def _reference_rim_factory(cfg_kwargs):
    """Build the upstream rim env for record_rim and pin its world into
    cfg_kwargs so the replay rebuilds the same map/placements."""
    from pogema import GridConfig as RefGridConfig, pogema_v0 as ref_v0

    probe = ref_v0(grid_config=RefGridConfig(**cfg_kwargs))
    probe.reset(seed=cfg_kwargs.get("seed"))
    g = probe.unwrapped.grid if hasattr(probe.unwrapped, "grid") else probe.unwrapped
    pinned = dict(
        cfg_kwargs,
        map=np.asarray(g.get_obstacles(ignore_borders=True), np.uint8).tolist(),
        agents_xy=[list(map(int, p)) for p in g.get_agents_xy(ignore_borders=True)],
        targets_xy=[list(map(int, p)) for p in g.get_targets_xy(ignore_borders=True)],
    )
    return ref_v0(grid_config=RefGridConfig(**pinned)), pinned


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
    factory = _reference_rim_factory if args.from_reference else None
    for name, kwargs in RIM_SCENARIOS.items():
        path = os.path.join(outdir, f"{name}.json")
        with open(path, "w") as f:
            json.dump(record_rim(name, kwargs, make_env=factory), f)
        print("wrote", path)


if __name__ == "__main__":
    main()
