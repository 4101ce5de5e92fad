"""Collision-system tests: handcrafted scenarios + randomized differential
tests vs the NumPy oracle (SURVEY.md §4 implication (b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pogema_tpu import GridConfig
from pogema_tpu.core import collisions
from pogema_tpu.utils.oracle import OracleEnv

# Actions: 0=stay 1=up 2=down 3=left 4=right
STAY, UP, DOWN, LEFT, RIGHT = range(5)


def make_cfg(n, system, size=8):
    return GridConfig(
        seed=0, size=size, num_agents=n, obs_radius=1, collision_system=system
    ).to_static()


def empty_grid(cfg):
    p = cfg.padded_size
    g = np.ones((p, p), np.uint8)
    r = cfg.obs_radius
    g[r : r + cfg.size, r : r + cfg.size] = 0
    return g


def resolve(cfg, grid, xy, active, actions):
    out = collisions.resolve_moves(
        cfg,
        jnp.asarray(grid),
        jnp.asarray(xy, jnp.int32),
        jnp.asarray(active),
        jnp.asarray(actions, jnp.int32),
    )
    return np.asarray(out).tolist()


@pytest.mark.parametrize("system", ["priority", "block_both", "soft"])
def test_free_moves_apply(system):
    cfg = make_cfg(2, system)
    grid = empty_grid(cfg)
    xy = [[2, 2], [5, 5]]
    got = resolve(cfg, grid, xy, [True, True], [RIGHT, UP])
    assert got == [[2, 3], [4, 5]]


@pytest.mark.parametrize("system", ["priority", "block_both", "soft"])
def test_obstacle_blocks(system):
    cfg = make_cfg(1, system)
    grid = empty_grid(cfg)
    grid[2, 3] = 1
    got = resolve(cfg, grid, [[2, 2]], [True], [RIGHT])
    assert got == [[2, 2]]


@pytest.mark.parametrize("system", ["priority", "block_both", "soft"])
def test_border_blocks(system):
    cfg = make_cfg(1, system)
    grid = empty_grid(cfg)
    r = cfg.obs_radius
    got = resolve(cfg, grid, [[r, r]], [True], [UP])
    assert got == [[r, r]]


@pytest.mark.parametrize("system", ["priority", "block_both", "soft"])
def test_swap_blocked(system):
    cfg = make_cfg(2, system)
    grid = empty_grid(cfg)
    xy = [[2, 2], [2, 3]]
    got = resolve(cfg, grid, xy, [True, True], [RIGHT, LEFT])
    assert got == xy  # edge conflict: both stay in every system


def test_vertex_conflict_priority_lower_index_wins():
    cfg = make_cfg(2, "priority")
    grid = empty_grid(cfg)
    xy = [[2, 2], [2, 4]]
    got = resolve(cfg, grid, xy, [True, True], [RIGHT, LEFT])
    assert got == [[2, 3], [2, 4]]


@pytest.mark.parametrize("system", ["block_both", "soft"])
def test_vertex_conflict_both_stay(system):
    cfg = make_cfg(2, system)
    grid = empty_grid(cfg)
    xy = [[2, 2], [2, 4]]
    got = resolve(cfg, grid, xy, [True, True], [RIGHT, LEFT])
    assert got == xy


def test_chain_following_priority():
    # A train moving right: in priority order, each agent follows the one
    # ahead of it (earlier agents vacate first).
    cfg = make_cfg(3, "priority")
    grid = empty_grid(cfg)
    xy = [[2, 4], [2, 3], [2, 2]]  # agent 0 leads
    got = resolve(cfg, grid, xy, [True] * 3, [RIGHT] * 3)
    assert got == [[2, 5], [2, 4], [2, 3]]


def test_chain_following_soft_allowed_block_both_blocked():
    xy = [[2, 2], [2, 3]]  # agent 1 ahead of agent 0? order: 0 behind 1
    actions = [RIGHT, RIGHT]
    cfg_soft = make_cfg(2, "soft")
    grid = empty_grid(cfg_soft)
    assert resolve(cfg_soft, grid, xy, [True, True], actions) == [[2, 3], [2, 4]]
    cfg_bb = make_cfg(2, "block_both")
    # block_both: follower blocked (target currently occupied), leader moves
    assert resolve(cfg_bb, grid, xy, [True, True], actions) == [[2, 2], [2, 4]]


def test_soft_chain_blocked_when_leader_blocked():
    cfg = make_cfg(3, "soft")
    grid = empty_grid(cfg)
    grid[2, 5] = 1  # leader hits a wall
    xy = [[2, 2], [2, 3], [2, 4]]
    got = resolve(cfg, grid, xy, [True] * 3, [RIGHT] * 3)
    assert got == xy


@pytest.mark.parametrize("system", ["priority", "block_both", "soft"])
def test_inactive_agents_dont_move_or_block(system):
    cfg = make_cfg(2, system)
    grid = empty_grid(cfg)
    xy = [[2, 2], [2, 3]]
    got = resolve(cfg, grid, xy, [True, False], [RIGHT, RIGHT])
    assert got[0] == [2, 3]  # moves onto hidden agent's cell
    assert got[1] == [2, 3]  # hidden agent never moves


@pytest.mark.parametrize("system", ["priority", "block_both", "soft"])
@pytest.mark.parametrize("seed", range(8))
def test_random_differential_vs_oracle(system, seed):
    rng = np.random.default_rng(seed)
    n = 12
    cfg = make_cfg(n, system, size=8)
    grid = empty_grid(cfg)
    # random obstacles in the interior
    r = cfg.obs_radius
    interior = rng.random((cfg.size, cfg.size)) < 0.25
    grid[r : r + cfg.size, r : r + cfg.size] = interior
    free = np.argwhere(grid == 0)
    idx = rng.choice(len(free), size=n, replace=False)
    xy = free[idx]
    active = rng.random(n) > 0.2
    targets = free[rng.choice(len(free), size=n, replace=False)]

    oracle = OracleEnv(cfg, grid, xy, targets, active=list(active))
    for _ in range(20):
        actions = rng.integers(0, 5, size=n)
        got = resolve(cfg, grid, oracle.agents_xy, list(active), actions)
        oracle_xy = {
            "priority": oracle._move_priority,
            "block_both": oracle._move_block_both,
            "soft": oracle._move_soft,
        }[system](actions)
        oracle.agents_xy = oracle_xy
        assert got == [list(t) for t in oracle_xy]
        # invariant: no two active agents share a cell
        occ = [tuple(c) for i, c in enumerate(oracle_xy) if active[i]]
        assert len(occ) == len(set(occ))
        # invariant: nobody stands on an obstacle
        for x, y in oracle_xy:
            assert grid[x, y] == 0


@pytest.mark.parametrize("system", ["priority", "block_both", "soft"])
def test_long_train_chain(system):
    """64-agent train: the worst case for the Jacobi fixpoint (follow
    chain of maximal depth). Must match the sequential oracle exactly."""
    n = 64
    cfg = make_cfg(n, system, size=70)
    grid = empty_grid(cfg)
    r = cfg.obs_radius
    # leader at the right end with the LOWEST index (so in priority order
    # the whole train moves); followers behind
    xy = [[r + 1, r + n - i] for i in range(1, n + 1)]
    actions = [RIGHT] * n
    got = resolve(cfg, grid, xy, [True] * n, actions)
    oracle = OracleEnv(cfg, grid, xy, xy)
    want = {
        "priority": oracle._move_priority,
        "block_both": oracle._move_block_both,
        "soft": oracle._move_soft,
    }[system](actions)
    assert got == [list(t) for t in want]
    # leader starts at col r+n-1, tail at col r
    if system in ("priority", "soft"):
        # whole train advances
        assert got[0][1] == r + n
        assert got[-1][1] == r + 1
    else:  # block_both: only the unobstructed leader moves
        assert got[0][1] == r + n
        assert got[1][1] == r + n - 2


@pytest.mark.parametrize("system", ["priority", "block_both", "soft"])
def test_reversed_train_blocked(system):
    """Same train but the leader has the HIGHEST index: in priority
    order every follower moves before the cell ahead is vacated, so only
    the leader advances."""
    n = 8
    cfg = make_cfg(n, system, size=16)
    grid = empty_grid(cfg)
    r = cfg.obs_radius
    xy = [[r + 1, r + i] for i in range(1, n + 1)]  # agent n-1 leads
    actions = [RIGHT] * n
    got = resolve(cfg, grid, xy, [True] * n, actions)
    oracle = OracleEnv(cfg, grid, xy, xy)
    want = {
        "priority": oracle._move_priority,
        "block_both": oracle._move_block_both,
        "soft": oracle._move_soft,
    }[system](actions)
    assert got == [list(t) for t in want]
    assert got[-1][1] == r + n + 1  # leader always advances
    if system == "priority":
        assert got[0][1] == r + 1  # tail blocked (cells vacate after its turn)
    if system == "soft":
        assert got[0][1] == r + 2  # chains through vacated cells allowed


@pytest.mark.parametrize("system", ["priority", "block_both", "soft"])
def test_rotating_cycle(system):
    """Four agents in a 2x2 ring all rotating clockwise: soft allows the
    rotation, priority and block_both must block it (each target is an
    occupied cell whose occupant moves 'later')."""
    cfg = make_cfg(4, system)
    grid = empty_grid(cfg)
    r = cfg.obs_radius
    a, b = r + 2, r + 3
    xy = [[a, a], [a, b], [b, b], [b, a]]
    actions = [RIGHT, DOWN, LEFT, UP]
    got = resolve(cfg, grid, xy, [True] * 4, actions)
    oracle = OracleEnv(cfg, grid, xy, xy)
    want = {
        "priority": oracle._move_priority,
        "block_both": oracle._move_block_both,
        "soft": oracle._move_soft,
    }[system](actions)
    assert got == [list(t) for t in want]
    if system == "soft":
        assert got == [[a, b], [b, b], [b, a], [a, a]]  # rotated
    else:
        assert got == xy  # frozen


def test_single_agent_fast_path_matches_general_resolvers():
    """cfg.num_agents == 1 skips the [N, N] machinery; it must equal every
    general resolver exactly (no agent-agent conflicts exist at N=1)."""
    import numpy as np

    from pogema_tpu.core import collisions
    from pogema_tpu.grid_config import GridConfig

    rng = np.random.default_rng(0)
    for trial in range(20):
        size, r = 6, 2
        p = size + 2 * r
        grid = np.ones((p, p), np.uint8)
        inner = (rng.random((size, size)) < 0.3).astype(np.uint8)
        grid[r:-r, r:-r] = inner
        free = np.argwhere(grid == 0)
        xy = free[rng.integers(len(free))][None, :].astype(np.int32)
        active = np.ones(1, bool)
        action = rng.integers(0, 5, size=1).astype(np.int32)
        cfg = GridConfig(seed=0, size=size, num_agents=1, obs_radius=r).to_static()
        fast = np.asarray(collisions.resolve_moves(
            cfg, jnp.asarray(grid), jnp.asarray(xy), jnp.asarray(active),
            jnp.asarray(action)))
        for name, fn in collisions._RESOLVERS.items():
            ref = np.asarray(fn(jnp.asarray(grid), jnp.asarray(xy),
                                jnp.asarray(active), jnp.asarray(action)))
            assert np.array_equal(fast, ref), (trial, name)


def test_priority_fixpoint_depth_instrumentation():
    """priority_fixpoint_depth: ~chain-length passes for a wall-blocked
    follow chain in adversarial index order, small for random traffic."""
    k = 16
    cfg = make_cfg(k, "priority", size=k + 4)
    grid = empty_grid(cfg)
    r = cfg.obs_radius
    row = r + 1
    wall_col = r + k + 1
    grid[row, wall_col] = 1
    # Agent i at column wall_col-1-i: agent 0 is at the wall; everyone
    # moves right, so each pass can only block one more agent (agent i's
    # blocker is the FINAL position of lower-indexed agent i-1).
    xy = np.array([[row, wall_col - 1 - i] for i in range(k)], np.int32)
    actions = np.full(k, RIGHT, np.int32)
    depth = int(collisions.priority_fixpoint_depth(
        jnp.asarray(grid), jnp.asarray(xy), jnp.ones(k, bool),
        jnp.asarray(actions)))
    assert k - 1 <= depth <= k + 2, depth
    # Nobody moves (the whole chain is blocked).
    out = resolve(cfg, grid, xy, np.ones(k, bool), actions)
    assert out == xy.tolist()

    # Random traffic converges in a handful of passes.
    rng = np.random.default_rng(1)
    cfg2 = make_cfg(8, "priority")
    grid2 = empty_grid(cfg2)
    free = np.argwhere(grid2 == 0)
    sel = free[rng.choice(len(free), size=8, replace=False)].astype(np.int32)
    depth2 = int(collisions.priority_fixpoint_depth(
        jnp.asarray(grid2), jnp.asarray(sel), jnp.ones(8, bool),
        jnp.asarray(rng.integers(0, 5, size=8).astype(np.int32))))
    assert 1 <= depth2 <= 6, depth2


@pytest.mark.parametrize("peel", [1, 3, 5, 80])
@pytest.mark.parametrize("system", ["priority", "soft"])
def test_peel_is_semantics_invariant(system, peel, monkeypatch):
    """_PEEL (passes inlined ahead of the while_loop, collisions._PEEL)
    must not change results for ANY value: the Jacobi update is monotone,
    so passes past the fixpoint are no-ops — including a peel (80) far
    beyond the deepest chain here. Covers the wall-blocked follow chain
    (depth == n, the hardest case for early loop exit) and random
    differential traffic."""
    n = 24
    cfg = make_cfg(n, system, size=32)
    grid = empty_grid(cfg)
    r = cfg.obs_radius
    row = r + 1
    grid[row, r + n + 1] = 1  # wall ahead of the chain head
    xy = [[row, r + n - i] for i in range(n)]  # agent 0 at the wall
    actions = [RIGHT] * n

    monkeypatch.setattr(collisions, "_PEEL", 0)
    base_chain = resolve(cfg, grid, xy, [True] * n, actions)
    monkeypatch.setattr(collisions, "_PEEL", peel)
    assert resolve(cfg, grid, xy, [True] * n, actions) == base_chain

    rng = np.random.default_rng(7)
    free = np.argwhere(grid == 0)
    rxy = free[rng.choice(len(free), size=n, replace=False)].astype(np.int32)
    for _ in range(5):
        racts = rng.integers(0, 5, size=n).astype(np.int32)
        monkeypatch.setattr(collisions, "_PEEL", 0)
        want = resolve(cfg, grid, rxy, [True] * n, racts)
        monkeypatch.setattr(collisions, "_PEEL", peel)
        assert resolve(cfg, grid, rxy, [True] * n, racts) == want
        rxy = np.asarray(want, np.int32)
