"""Construction/validation tests (SURVEY.md §4 style 1)."""

import pytest

from pogema_tpu import FREE, MOVES, OBSTACLE, GridConfig
from pogema_tpu.grid_config import parse_map


def test_defaults():
    cfg = GridConfig(seed=1)
    assert cfg.size == 8
    assert cfg.density == 0.3
    assert cfg.num_agents == 1
    assert cfg.obs_radius == 5
    assert cfg.max_episode_steps == 64
    assert cfg.on_target == "finish"
    assert cfg.collision_system == "priority"
    assert cfg.observation_type == "default"


def test_constants():
    assert FREE == 0 and OBSTACLE == 1
    assert MOVES[0] == (0, 0)
    assert len(MOVES) == 5


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(size=1),
        dict(density=1.0),
        dict(density=-0.1),
        dict(num_agents=0),
        dict(obs_radius=0),
        dict(max_episode_steps=0),
        dict(collision_system="bogus"),
        dict(on_target="bogus"),
        dict(observation_type="bogus"),
        dict(integration="bogus"),
    ],
)
def test_validation_raises(kwargs):
    with pytest.raises(Exception):
        GridConfig(seed=1, **kwargs)


def test_seed_optional():
    # seed=None means "fresh map every reset" (resolved by the host rim)
    assert GridConfig().seed is None
    assert GridConfig(seed=5).seed == 5


def test_parse_map_string():
    grid, agents, targets = parse_map(".#.\n.A.\na#.")
    assert grid == [[0, 1, 0], [0, 0, 0], [0, 1, 0]]
    assert agents == [[1, 1]]
    assert targets == [[2, 0]]


def test_parse_map_spaces():
    grid, _, _ = parse_map(". # .\n. . .")
    assert grid == [[0, 1, 0], [0, 0, 0]]


def test_parse_map_unmatched_letter():
    with pytest.raises(ValueError):
        parse_map(".A.\n...")


def test_map_sets_size_and_positions():
    cfg = GridConfig(seed=1, map=".#.\n.A.\na#.")
    assert cfg.size >= 3
    assert cfg.agents_xy == [[1, 1]]
    assert cfg.targets_xy == [[2, 0]]
    assert cfg.num_agents == 1


def test_agents_targets_must_pair():
    with pytest.raises(Exception):
        GridConfig(seed=1, agents_xy=[[0, 0]])
    cfg = GridConfig(seed=1, agents_xy=[[0, 0], [1, 1]], targets_xy=[[2, 2], [3, 3]])
    assert cfg.num_agents == 2


def test_static_config_hashable():
    a = GridConfig(seed=1).to_static()
    b = GridConfig(seed=2).to_static()
    assert a == b and hash(a) == hash(b)  # seed is not static
    c = GridConfig(seed=1, size=16).to_static()
    assert a != c
    assert a.padded_size == 8 + 2 * 5
    assert a.window == 11
