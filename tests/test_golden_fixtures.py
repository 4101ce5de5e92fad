"""Golden-trajectory regression tests (tests/make_fixtures.py).

Two fixture kinds, distinguished by ``source``:

* ``"engine"`` — recorded from this engine: refactor armor, bit-exact,
  including obs checksums. NOT reference-parity evidence.
* ``"reference"`` — recorded from pip-installed upstream pogema
  (``make_fixtures.py --from-reference``): carries the explicit world
  (map + placements, logical coords) which is replayed through our
  engine; the fixture's ``compare`` list says which step fields must
  match (LifeLong pins positions only — PARITY_RISKS.md row 10).

Regenerate consciously, with a semantics-change rationale.
"""

import glob
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from pogema_tpu import GridConfig, PogemaCore

ALL_FIXTURES = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "fixtures", "*.json"))
)


def _is_rim(path):
    return os.path.basename(path).startswith("rim_")


FIXTURES = [p for p in ALL_FIXTURES if not _is_rim(p)]
RIM_FIXTURES = [p for p in ALL_FIXTURES if _is_rim(p)]


def _build_core(data):
    """(core, reset_key, logical->padded offset) for either fixture kind."""
    if data.get("source") == "reference":
        cfg = GridConfig(
            **{**data["config"], "seed": 0},
            map=data["map"],
            agents_xy=data["agents_xy"],
            targets_xy=data["targets_xy"],
        )
        return PogemaCore(cfg, num_envs=1), 0, cfg.obs_radius
    cfg = GridConfig(**data["config"])
    return PogemaCore(cfg, num_envs=1), data["reset_key_seed"], 0


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_golden_trajectory(path):
    with open(path) as f:
        data = json.load(f)
    compare = set(data.get("compare") or
                  ["agents_xy", "targets_xy", "rewards", "terminated",
                   "obs_checksum"])
    core, reset_key, off = _build_core(data)
    state, obs = core.reset(reset_key)

    assert (np.asarray(state.agents_xy[0]) - off).tolist() == data["agents_xy"]
    assert (np.asarray(state.targets_xy[0]) - off).tolist() == data["targets_xy"]
    if "obstacles" in data:
        assert np.asarray(state.obstacles[0]).tolist() == data["obstacles"]
    if "obs_checksum" in data:
        assert float(np.asarray(obs).sum()) == pytest.approx(data["obs_checksum"])

    for t, step in enumerate(data["steps"]):
        state, res, done, mets = core.step(
            state, jnp.asarray([step["actions"]])
        )
        if "agents_xy" in compare:
            assert (np.asarray(state.agents_xy[0]) - off).tolist() == \
                step["agents_xy"], f"step {t}"
        if "targets_xy" in compare:
            assert (np.asarray(state.targets_xy[0]) - off).tolist() == \
                step["targets_xy"], f"step {t}"
        if "rewards" in compare:
            assert np.asarray(res.rewards[0]).tolist() == step["rewards"], f"step {t}"
        if "terminated" in compare:
            assert (
                np.asarray(res.terminated[0]).astype(int).tolist()
                == step["terminated"]
            ), f"step {t}"
        if "obs_checksum" in compare:
            assert float(np.asarray(res.observations[0]).sum()) == pytest.approx(
                step["obs_checksum"]
            ), f"step {t}"
    if data.get("source") != "reference":
        for k, v in data["metrics"].items():
            assert float(mets[k][0]) == pytest.approx(v), k


@pytest.mark.parametrize("path", RIM_FIXTURES,
                         ids=[os.path.basename(p) for p in RIM_FIXTURES])
def test_golden_rim_trajectory(path):
    """Replay a rim-recorded fixture (POMAPF/MAPF dict obs) through
    pogema_v0: obs key SETS and per-key checksums must match exactly
    (PARITY_RISKS rows 6-8). ``reference-rim`` fixtures carry the pinned
    upstream world in their config, so GridConfig(**config) rebuilds it."""
    from pogema_tpu import pogema_v0

    with open(path) as f:
        data = json.load(f)
    env = pogema_v0(GridConfig(**data["config"]))
    obs, _ = env.reset(seed=data["config"].get("seed"))
    u = env.unwrapped
    grid = u if hasattr(u, "get_obstacles") else u.grid

    assert sorted(obs[0].keys()) == data["obs_keys"]
    assert [list(map(int, p)) for p in grid.get_agents_xy()] == data["agents_xy"]
    assert [list(map(int, p)) for p in grid.get_targets_xy()] == data["targets_xy"]
    assert np.asarray(grid.get_obstacles(), np.uint8).tolist() == data["map"]
    for k, v in data["obs_checksums"].items():
        got = float(sum(np.asarray(o[k], np.float64).sum() for o in obs))
        assert got == pytest.approx(v), f"reset obs[{k}]"

    compare = set(data.get("compare") or
                  ["agents_xy", "rewards", "terminated", "truncated",
                   "obs_checksums"])
    for t, step in enumerate(data["steps"]):
        obs, rewards, term, trunc, _ = env.step(step["actions"])
        if "agents_xy" in compare:
            assert [list(map(int, p)) for p in grid.get_agents_xy()] == \
                step["agents_xy"], f"step {t}"
        if "rewards" in compare:
            assert [float(r) for r in rewards] == step["rewards"], f"step {t}"
        if "terminated" in compare:
            assert [int(bool(x)) for x in term] == step["terminated"], f"step {t}"
        if "truncated" in compare:
            assert [int(bool(x)) for x in trunc] == step["truncated"], f"step {t}"
        if "obs_checksums" in compare:
            for k, v in step["obs_checksums"].items():
                got = float(sum(np.asarray(o[k], np.float64).sum()
                                for o in obs))
                assert got == pytest.approx(v), f"step {t} obs[{k}]"


def test_fixtures_exist():
    assert len(FIXTURES) >= 7, "run python tests/make_fixtures.py"
    assert len(RIM_FIXTURES) >= 2, "run python tests/make_fixtures.py"
