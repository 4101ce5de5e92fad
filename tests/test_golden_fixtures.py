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

FIXTURES = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "fixtures", "*.json"))
)


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


def test_fixtures_exist():
    assert len(FIXTURES) >= 4, "run python tests/make_fixtures.py"
