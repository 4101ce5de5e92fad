"""Generator tests: maps, connectivity, placement, respawn table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pogema_tpu import GridConfig
from pogema_tpu.core import generator


def bfs_components(grid):
    """Reference 4-connectivity labeling (host, trusted)."""
    p = grid.shape[0]
    big = p * p
    labels = np.full((p, p), big, np.int64)
    comp_of = {}
    for sx in range(p):
        for sy in range(p):
            if grid[sx, sy] or labels[sx, sy] != big:
                continue
            stack = [(sx, sy)]
            members = []
            labels[sx, sy] = 0
            while stack:
                x, y = stack.pop()
                members.append((x, y))
                for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    nx, ny = x + dx, y + dy
                    if 0 <= nx < p and 0 <= ny < p and not grid[nx, ny] and labels[nx, ny] == big:
                        labels[nx, ny] = 0
                        stack.append((nx, ny))
            root = min(x * p + y for x, y in members)
            for x, y in members:
                comp_of[(x, y)] = root
    out = np.full((p, p), big, np.int64)
    for (x, y), root in comp_of.items():
        out[x, y] = root
    return out.reshape(-1)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("density", [0.0, 0.3, 0.6])
def test_connected_components_match_bfs(seed, density):
    cfg = GridConfig(seed=seed, size=12, density=density, obs_radius=2).to_static()
    grid = generator.pad_grid(cfg, generator.bernoulli_obstacles(cfg, jax.random.key(seed)))
    got = np.asarray(generator.connected_components(grid))
    want = bfs_components(np.asarray(grid))
    assert (got == want).all()


def test_bernoulli_density():
    cfg = GridConfig(seed=0, size=64, density=0.3).to_static()
    grid = generator.bernoulli_obstacles(cfg, jax.random.key(0))
    frac = float(jnp.mean(grid.astype(jnp.float32)))
    assert 0.25 < frac < 0.35


def test_maze_fully_connected():
    for seed in range(3):
        cfg = GridConfig(seed=seed, size=17, obs_radius=2).to_static()
        maze = generator.sidewinder_maze(cfg, jax.random.key(seed))
        padded = generator.pad_grid(cfg, maze)
        comps = np.asarray(generator.connected_components(padded))
        free_labels = comps[comps < cfg.padded_size**2]
        assert len(free_labels) > 0
        assert len(np.unique(free_labels)) == 1  # perfect maze: one component


@pytest.mark.parametrize("collision_system", ["priority"])
def test_placement_valid(collision_system):
    cfg = GridConfig(
        seed=3, size=16, density=0.3, num_agents=8, obs_radius=3
    ).to_static()
    p = cfg.padded_size
    for seed in range(4):
        grid, agents, targets, comps, ok = jax.jit(
            generator.generate_env, static_argnums=(0, 5)
        )(cfg, jax.random.key(seed))
        grid = np.asarray(grid)
        agents = np.asarray(agents)
        targets = np.asarray(targets)
        comps = np.asarray(comps)
        # all on free cells
        assert not grid[agents[:, 0], agents[:, 1]].any()
        assert not grid[targets[:, 0], targets[:, 1]].any()
        # distinct agents, distinct targets
        a_cells = agents[:, 0] * p + agents[:, 1]
        t_cells = targets[:, 0] * p + targets[:, 1]
        assert len(set(a_cells)) == len(a_cells)
        assert len(set(t_cells)) == len(t_cells)
        # reachability: agent and target share a component; never own cell
        assert (comps[a_cells] == comps[t_cells]).all()
        assert (a_cells != t_cells).all()


def test_fixed_map_and_positions():
    cfg_model = GridConfig(seed=1, map="...\n.#.\n...", obs_radius=1,
                           agents_xy=[[0, 0]], targets_xy=[[2, 2]])
    cfg = cfg_model.to_static()
    fixed_map = jnp.asarray(np.array(cfg_model.map, np.uint8))
    grid, agents, targets, _, ok = generator.generate_env(
        cfg, jax.random.key(0), fixed_map,
        jnp.asarray(cfg_model.agents_xy), jnp.asarray(cfg_model.targets_xy),
    )
    r = cfg.obs_radius
    assert np.asarray(agents).tolist() == [[r, r]]
    assert np.asarray(targets).tolist() == [[2 + r, 2 + r]]
    assert np.asarray(grid)[1 + r, 1 + r] == 1


def test_respawn_table_uniform_within_component():
    cfg = GridConfig(seed=5, size=10, density=0.2, obs_radius=2).to_static()
    p = cfg.padded_size
    grid = generator.pad_grid(cfg, generator.bernoulli_obstacles(cfg, jax.random.key(7)))
    comps = generator.connected_components(grid)
    table = jax.tree.map(np.asarray, generator.build_respawn_table(comps, p))
    comps_np = np.asarray(comps)
    # pick an agent cell in the biggest component
    free_cells = np.where(comps_np < p * p)[0]
    labels, counts = np.unique(comps_np[free_cells], return_counts=True)
    comp = labels[np.argmax(counts)]
    members = set(np.where(comps_np == comp)[0].tolist())
    agent_cell = min(members)
    draws = set()
    table_j = {k: jnp.asarray(v) for k, v in table.items()}
    for i in range(200):
        c = int(
            generator.sample_new_target(
                jax.random.key(i), table_j, comps, jnp.int32(agent_cell)
            )
        )
        draws.add(c)
        assert c in members and c != agent_cell
    # should cover most of the component
    assert len(draws) > min(len(members) - 1, 30) * 0.5


def test_map_bank_selection():
    cfg = GridConfig(seed=0, size=6, obs_radius=1, num_agents=1).to_static()
    bank = np.zeros((3, 6, 6), np.uint8)
    bank[1, :, :] = 0
    bank[2, 2, :] = 1  # wall row
    grid, agents, targets, _, _ok = generator.generate_env(
        cfg, jax.random.key(4), None, None, None, False, jnp.asarray(bank)
    )
    assert np.asarray(grid).shape == (cfg.padded_size, cfg.padded_size)
