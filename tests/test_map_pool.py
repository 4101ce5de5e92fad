"""Realistic built-in map pool (VERDICT r1 item 6) + config E at spec.

The pool maps are library features reachable through
``GridConfig(map_name=...)`` and ``PogemaCore(map_bank=...)``; the
config-E-at-spec test proves the full 8192x256x128x128 program compiles
and executes sharded on the 8-device CPU mesh (slow — gated behind
POGEMA_HEAVY_TESTS=1).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu import maps as maps_mod

POOL_64 = [n for n in maps_mod.list_maps() if "64x64" in n]


def test_pool_has_realistic_coverage():
    kinds = {"maze", "warehouse", "city", "movingai", "random"}
    assert len(POOL_64) >= 9, POOL_64
    present = {k for k in kinds for n in maps_mod.list_maps() if n.startswith(k)}
    assert present == kinds, present


@pytest.mark.parametrize("name", sorted(POOL_64))
def test_pool_map_loads_and_steps(name):
    cfg = GridConfig(seed=0, map_name=name, num_agents=8, obs_radius=3,
                     max_episode_steps=8)
    assert cfg.size == 64
    core = PogemaCore(cfg, num_envs=2)
    state, obs = core.reset(jax.random.key(0))
    for i in range(3):
        actions = jax.random.randint(jax.random.key(i), (2, 8), 0, 5)
        state, res, _, _ = core.step(state, actions)
    # invariant: nobody on an obstacle
    g = np.asarray(state.obstacles)
    xy = np.asarray(state.agents_xy)
    for b in range(2):
        assert not g[b][xy[b, :, 0], xy[b, :, 1]].any()


def test_make_pool_and_bank_reset():
    bank = maps_mod.make_pool(["maze-64x64-0", "warehouse-64x64",
                               "city-64x64-0", "movingai-city-64x64"])
    assert bank.shape == (4, 64, 64) and bank.dtype == np.uint8
    cfg = GridConfig(seed=0, size=64, num_agents=4, obs_radius=2,
                     max_episode_steps=8)
    core = PogemaCore(cfg, num_envs=8, map_bank=bank)
    state, _ = core.reset(jax.random.key(1))
    # each env's obstacles must equal one bank entry (inside the border)
    r = 2
    inner = np.asarray(state.obstacles)[:, r:-r, r:-r]
    for b in range(8):
        assert any((inner[b] == bank[k]).all() for k in range(4))


def test_mixed_pool_and_benchmark_pool():
    mp = maps_mod.mixed_pool(32, k=8)
    assert mp.shape == (8, 32, 32)
    # half random (density ~0.3), half mazes (structured)
    dens = mp.reshape(8, -1).mean(axis=1)
    assert (np.abs(dens[:4] - 0.3) < 0.08).all(), dens
    bp = maps_mod.benchmark_pool(64)
    assert bp.shape[0] >= 9


def test_maze_braid():
    """braid=0 is the historical perfect maze; braid>0 only REMOVES
    walls (adds loops), never adds them, keeps connectivity, and only
    knocks out straight walls (both opposite neighbors open) — the
    round-5 config-E pool re-specification."""
    perfect = np.asarray(maps_mod.np_maze(33, seed=5), np.uint8)
    braided = np.asarray(maps_mod.np_maze(33, seed=5, braid=0.3), np.uint8)
    # monotone: walls only removed
    assert ((perfect == 0) <= (braided == 0)).all()
    removed = (perfect == 1) & (braided == 0)
    assert removed.sum() > 0
    # every removed wall was straight: opposite neighbors open in the
    # perfect maze (horizontally or vertically)
    xs, ys = np.nonzero(removed)
    for x, y in zip(xs, ys):
        horiz = (y > 0 and y + 1 < 33
                 and perfect[x, y - 1] == 0 and perfect[x, y + 1] == 0)
        vert = (x > 0 and x + 1 < 33
                and perfect[x - 1, y] == 0 and perfect[x + 1, y] == 0)
        assert horiz or vert, (x, y)
    # connectivity is preserved (perfect maze is fully connected on the
    # odd lattice; braiding cannot disconnect what it only opens)
    from collections import deque

    open_cells = np.argwhere(braided == 0)
    start = tuple(open_cells[0])
    seen = {start}
    dq = deque([start])
    while dq:
        x, y = dq.popleft()
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nx, ny = x + dx, y + dy
            if (0 <= nx < 33 and 0 <= ny < 33 and braided[nx, ny] == 0
                    and (nx, ny) not in seen):
                seen.add((nx, ny))
                dq.append((nx, ny))
    assert len(seen) == len(open_cells)


def test_mixed_pool_braid_default():
    """The config-E pool's maze half defaults to braided (strictly more
    open cells than the braid=0 historical pool); braid=0.0 reproduces
    the round-4 pool exactly."""
    new = maps_mod.mixed_pool(32, k=8)
    old = maps_mod.mixed_pool(32, k=8, braid=0.0)
    # random half identical
    assert (new[:4] == old[:4]).all()
    # maze half: walls only removed, and some removed
    assert ((old[4:] == 0) <= (new[4:] == 0)).all()
    assert (old[4:] != new[4:]).any()


def test_movingai_roundtrip():
    grid = maps_mod.np_city(32, seed=3)
    back = maps_mod.load_movingai(maps_mod.to_movingai(grid))
    assert back == [[int(c) for c in row] for row in grid]


@pytest.mark.skipif(
    not os.environ.get("POGEMA_HEAVY_TESTS"),
    reason="config E at spec is minutes-slow on CPU; set POGEMA_HEAVY_TESTS=1",
)
def test_config_e_at_spec_runs_sharded():
    """8192 envs x 256 agents x 128x128 mixed pool — the spec shape that
    faults a single v5e chip — compiles and executes on the 8-device CPU
    mesh (functional proof of the >=2-host program; VERDICT r1 weak #6)."""
    from pogema_tpu.parallel import make_mesh, shard_batch

    bank = maps_mod.mixed_pool(128, k=16)
    cfg = GridConfig(seed=0, size=128, num_agents=256, obs_radius=5,
                     max_episode_steps=128)
    core = PogemaCore(cfg, num_envs=8192, map_bank=bank)
    mesh = make_mesh(data=len(jax.devices()), model=1)
    step_auto = core._make_step_auto(with_obs=False)

    with mesh:
        # Obs-free reset: the initial obs tensor at 8192x256 is ~3 GB
        # and this test never reads it (the step path is obs-free too).
        state, _ = core.reset(jax.random.key(0), with_obs=False)
        state = shard_batch(state, mesh)

        @jax.jit
        def two_steps(s, i, key):
            def one(carry, _):
                st, k = carry
                k, kk = jax.random.split(k)
                a = jax.random.randint(kk, (8192, 256), 0, 5)
                ns, _, res, _, _ = step_auto(st, i, a)
                return (ns, k), res.rewards.sum()

            (s, _), r = jax.lax.scan(one, (s, key), None, length=2)
            return s, r.sum()

        s2, rew = two_steps(state, state, jax.random.key(1))
        assert np.isfinite(float(rew))
        g = np.asarray(s2.obstacles[:4])
        xy = np.asarray(s2.agents_xy[:4])
        for b in range(4):
            assert not g[b][xy[b, :, 0], xy[b, :, 1]].any()
