"""Day-1 parity swap-path rehearsal (PARITY_RISKS.md steps 2-3).

``tests/make_fixtures.py --from-reference`` is the one-command pivot to
true upstream parity the moment network access exists. Until then the
swap path itself must not rot: these tests vendor a FAKE ``pogema``
package (the documented upstream surface — ``GridConfig``, ``pogema_v0``,
an env whose ``.unwrapped.grid`` exposes the Grid accessors — backed by
our own engine) into ``sys.modules``, record reference-sourced fixtures
through the real ``record_from_reference`` / ``_reference_rim_factory``
code paths, and replay them through the real golden-fixture comparison.

Because the fake IS our engine, the replay must match bit-exactly — any
failure is a break in the recording/replay plumbing, found today instead
of on parity day."""

import json
import sys
import types

import numpy as np
import pytest

import make_fixtures
import test_golden_fixtures as replay


@pytest.fixture()
def fake_pogema(monkeypatch):
    """A module shaped like upstream pogema, backed by pogema_tpu."""
    from pogema_tpu import GridConfig
    from pogema_tpu.envs import pogema_v0 as our_v0

    mod = types.ModuleType("pogema")
    mod.GridConfig = GridConfig

    def fake_v0(grid_config=None, **kwargs):
        env = our_v0(grid_config, **kwargs)
        # Upstream envs expose the Grid object as ``env.grid``; our rim
        # folds the accessors into the env itself. Mirror the upstream
        # attribute so the recorder exercises its hasattr(.., "grid")
        # branch exactly as it would against the real package.
        env.unwrapped.grid = env.unwrapped
        return env

    mod.pogema_v0 = fake_v0
    monkeypatch.setitem(sys.modules, "pogema", mod)
    return mod


def test_record_from_reference_and_replay(fake_pogema, tmp_path):
    for name in ("finish_priority", "lifelong"):
        cfg_kwargs = make_fixtures.SCENARIOS[name]
        data = make_fixtures.record_from_reference(name, cfg_kwargs)
        assert data["source"] == "reference"
        assert "map" in data and "agents_xy" in data and data["steps"]
        lifelong = cfg_kwargs.get("on_target") == "restart"
        assert data["compare"] == (["agents_xy"] if lifelong else
                                   ["agents_xy", "targets_xy", "rewards",
                                    "terminated"])
        path = tmp_path / f"{name}.json"
        path.write_text(json.dumps(data))
        # The real replay comparison, fed a reference-sourced fixture:
        # rebuilds the pinned world via GridConfig(map=..., agents_xy=...,
        # targets_xy=...) and checks every compare field step by step.
        replay.test_golden_trajectory(str(path))


def test_record_rim_from_reference_and_replay(fake_pogema, tmp_path):
    for name, cfg_kwargs in make_fixtures.RIM_SCENARIOS.items():
        data = make_fixtures.record_rim(
            name, cfg_kwargs, make_env=make_fixtures._reference_rim_factory)
        assert data["source"] == "reference-rim"
        # the factory pins the upstream world into the fixture config
        assert "map" in data["config"] and "agents_xy" in data["config"]
        path = tmp_path / f"{name}.json"
        path.write_text(json.dumps(data))
        replay.test_golden_rim_trajectory(str(path))


def test_replay_catches_divergence(fake_pogema, tmp_path):
    """The comparison must actually FAIL on a wrong trajectory — guard
    against a vacuously-green parity harness."""
    data = make_fixtures.record_from_reference(
        "finish_priority", make_fixtures.SCENARIOS["finish_priority"])
    # corrupt one recorded position mid-trajectory
    data["steps"][3]["agents_xy"][0][0] += 1
    path = tmp_path / "corrupt.json"
    path.write_text(json.dumps(data))
    with pytest.raises(AssertionError):
        replay.test_golden_trajectory(str(path))
