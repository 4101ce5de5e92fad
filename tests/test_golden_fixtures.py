"""Golden-trajectory regression tests: the engine must reproduce the
recorded fixtures bit-exactly (tests/make_fixtures.py). These freeze the
semantics across refactors of the hot path; regenerate consciously (and
only with a semantics-change rationale) via `python tests/make_fixtures.py`.
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


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_golden_trajectory(path):
    with open(path) as f:
        data = json.load(f)
    cfg = GridConfig(**data["config"])
    core = PogemaCore(cfg, num_envs=1)
    state, obs = core.reset(data["reset_key_seed"])

    assert np.asarray(state.obstacles[0]).tolist() == data["obstacles"]
    assert np.asarray(state.agents_xy[0]).tolist() == data["agents_xy"]
    assert np.asarray(state.targets_xy[0]).tolist() == data["targets_xy"]
    assert float(np.asarray(obs).sum()) == pytest.approx(data["obs_checksum"])

    for t, step in enumerate(data["steps"]):
        state, res, done, mets = core.step(
            state, jnp.asarray([step["actions"]])
        )
        assert np.asarray(state.agents_xy[0]).tolist() == step["agents_xy"], f"step {t}"
        assert np.asarray(state.targets_xy[0]).tolist() == step["targets_xy"], f"step {t}"
        assert np.asarray(res.rewards[0]).tolist() == step["rewards"], f"step {t}"
        assert (
            np.asarray(res.terminated[0]).astype(int).tolist() == step["terminated"]
        ), f"step {t}"
        assert float(np.asarray(res.observations[0]).sum()) == pytest.approx(
            step["obs_checksum"]
        ), f"step {t}"
    for k, v in data["metrics"].items():
        assert float(mets[k][0]) == pytest.approx(v), k


def test_fixtures_exist():
    assert len(FIXTURES) >= 4, "run python tests/make_fixtures.py"
