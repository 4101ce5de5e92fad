"""Procedural generation — TPU-native counterpart of the reference's
``pogema/generator.py`` (SURVEY.md §2 "Map generation", "Agent/goal
placement").

Everything here is jit-compatible and runs on device so vectorized resets
(including in-step auto-resets) never round-trip to the host:

* random obstacle maps: iid Bernoulli(density) per cell — same behavior as
  upstream ``generate_obstacles``;
* connected components: instead of the reference's host BFS, a min-label
  flood fill driven by *segmented directional scans* (log-depth
  ``lax.associative_scan`` along rows and columns, iterated to fixpoint
  under ``lax.while_loop``) — corridors propagate in one sweep, so the
  iteration count is the number of "turns" of the worst path, not its
  length;
* placement: agents as a uniform distinct sample of eligible free cells
  (top-k over iid uniforms), each target an independent uniform free cell
  of the *same* connected component (argmax over masked u32 random bits)
  — reachability by construction, like the reference's BFS check.
  EVERY sampler here is transcendental-free (uniform/randint/bits are
  exact bit manipulation of the threefry stream) so resets are bit-equal
  across XLA backends by construction; gumbel (-log(-log u)) is banned
  as a hazard — transcendental libm results are not guaranteed
  ULP-identical between XLA:CPU and XLA:TPU, and a last-ULP difference
  under argmax/top-k would silently flip a placement. (The scale
  divergences tests/test_tpu_scale.py actually caught were elsewhere —
  the flood-fill sweep fusion (see _segmented_min_scan) and a lost
  scatter in the target loop (see place_agents_and_targets) — but the
  integer sampler keeps the no-transcendentals invariant checkable.)
* a perfect-maze generator (sidewinder, parallelized with segmented
  scans) for the maze benchmark configs;
* O(1) LifeLong goal respawn via a component-sorted cell table built at
  reset (replaces upstream ``generate_new_target``).

The whole (map, placement) pipeline retries on-device (bounded
``lax.while_loop``) when a draw is degenerate, mirroring the reference's
host retry loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..grid_config import OBSTACLE, StaticConfig

_MAX_TRIES = 16


# ---------------------------------------------------------------------------
# obstacle maps
# ---------------------------------------------------------------------------


def bernoulli_obstacles(cfg: StaticConfig, key) -> jnp.ndarray:
    """iid Bernoulli(density) obstacles, u8[S, S]. Upstream:
    pogema/generator.py generate_obstacles."""
    u = jax.random.uniform(key, (cfg.size, cfg.size))
    return (u < cfg.density).astype(jnp.uint8)


def sidewinder_maze(cfg: StaticConfig, key) -> jnp.ndarray:
    """Perfect maze (single connected component) on the odd lattice,
    u8[S, S]. Sidewinder: row-wise runs of eastward carves; each closed run
    carves one northward passage at a uniformly random member. Runs are
    found and sampled with segmented scans — no Python loops.
    """
    s = cfg.size
    m = (s + 1) // 2  # lattice cells
    ke, kn = jax.random.split(key)
    carve_east = jax.random.bernoulli(ke, 0.5, (m, m))
    # Row 0 always carves east; the last column never can.
    row0 = jnp.zeros((m, m), bool).at[0, :].set(True)
    last_col = jnp.zeros((m, m), bool).at[:, m - 1].set(True)
    carve_east = (carve_east | row0) & ~last_col

    # Run segmentation along each row: a run starts at col 0 or after a
    # cell that did not carve east.
    prev_east = jnp.pad(carve_east[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    run_start = ~prev_east
    run_id_in_row = jnp.cumsum(run_start, axis=1) - 1
    seg = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) * m + run_id_in_row

    # One random member per run carves north (rows > 0).
    g = jax.random.uniform(kn, (m, m))
    seg_flat = seg.reshape(-1)
    seg_max = jax.ops.segment_max(g.reshape(-1), seg_flat, num_segments=m * m)
    north = (g == seg_max[seg_flat].reshape(m, m)) & ~row0

    # Rasterize onto the (2m-1)² lattice: cells at even coords are free.
    ll = 2 * m - 1
    grid = jnp.ones((ll, ll), jnp.uint8)
    cell_rows = jnp.arange(m) * 2
    grid = grid.at[cell_rows[:, None], cell_rows[None, :]].set(0)
    # East carve opens wall (2i, 2j+1).
    east_r = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) * 2
    east_c = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) * 2 + 1
    grid = grid.at[east_r, jnp.clip(east_c, 0, ll - 1)].min(
        jnp.where(carve_east, 0, 1).astype(jnp.uint8)
    )
    # North carve opens wall (2i-1, 2j).
    north_r = jnp.clip(east_r - 1, 0, ll - 1)
    north_c = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) * 2
    grid = grid.at[north_r, north_c].min(jnp.where(north, 0, 1).astype(jnp.uint8))
    # Crop or pad with obstacle to exactly S×S.
    if ll >= s:
        return grid[:s, :s]
    return jnp.pad(grid, ((0, s - ll), (0, s - ll)), constant_values=OBSTACLE)


def pad_grid(cfg: StaticConfig, grid: jnp.ndarray) -> jnp.ndarray:
    """Border-pad with obstacles of width obs_radius (the reference's
    slicing trick, upstream: pogema/grid.py)."""
    r = cfg.obs_radius
    return jnp.pad(grid.astype(jnp.uint8), ((r, r), (r, r)), constant_values=OBSTACLE)


# ---------------------------------------------------------------------------
# connected components (4-connectivity) via segmented directional scans
# ---------------------------------------------------------------------------


def _segmented_min_scan(vals, boundary, axis, reverse):
    """Segmented running minimum along ``axis``: the min is reset at
    boundary cells (obstacles).

    Implemented as a single ``lax.cummax`` primitive (native TPU lowering,
    far cheaper to compile than an associative_scan with a tuple carry)
    via the encoding w = seg_id * K + (K-1 - v): along the traversal
    direction, seg_id is non-decreasing, so the running max always comes
    from the current segment, and maximizing (K-1 - v) minimizes v. K must
    exceed every value; with labels < P*P and ≤ P segments per line, w
    stays well inside int32 for any practical grid.

    Direction/axis are expressed with the primitives' native ``reverse=``
    and ``axis=`` parameters — NOT jnp.flip/transpose around a forward
    row scan. The flip/transpose composition is miscompiled by XLA:TPU
    when the four directional scans of a flood-fill sweep fuse at batch
    >= ~1024 x 138x138 (each scan alone is bit-correct; the fused sweep
    returns labels leaked across segment boundaries — see
    benchmarks/floodfill_probe.py and tests/test_tpu_scale.py; the same
    family as the segment_sum miscompile noted in multi_cell_component).
    """
    big = vals.size  # labels are < P*P (+ sentinel)
    k = jnp.int32(big + 2)
    seg = lax.cumsum(boundary.astype(jnp.int32), axis=axis, reverse=reverse)
    w = seg * k + (k - 1 - jnp.minimum(vals, k - 1))
    w = lax.cummax(w, axis=axis, reverse=reverse)
    out = (k - 1) - (w - seg * k)
    return jnp.minimum(out, big)


@jax.jit
def connected_components(padded_grid: jnp.ndarray) -> jnp.ndarray:
    """Min-label flood fill. Returns i32[P*P]: for free cells the minimum
    flat index of their 4-connected component; obstacles get P*P."""
    p = padded_grid.shape[-1]
    big = p * p
    obstacle = padded_grid.astype(bool)
    labels = jnp.where(
        obstacle, big, jnp.arange(big, dtype=jnp.int32).reshape(p, p)
    ).astype(jnp.int32)

    def sweep(lab):
        lab = _segmented_min_scan(lab, obstacle, axis=1, reverse=False)
        lab = _segmented_min_scan(lab, obstacle, axis=1, reverse=True)
        lab = _segmented_min_scan(lab, obstacle, axis=0, reverse=False)
        return _segmented_min_scan(lab, obstacle, axis=0, reverse=True)

    def cond(carry):
        lab, prev, it = carry
        return jnp.any(lab != prev) & (it < big)

    def body(carry):
        lab, _, it = carry
        return sweep(lab), lab, it + 1

    labels, _, _ = lax.while_loop(cond, body, (sweep(labels), labels, jnp.int32(0)))
    return jnp.where(obstacle, big, labels).reshape(-1)


# ---------------------------------------------------------------------------
# placement
# ---------------------------------------------------------------------------


def multi_cell_component(components: jnp.ndarray, p: int) -> jnp.ndarray:
    """bool[P*P]: free cell whose component has >= 2 cells.

    A free cell's 4-connected component has size >= 2 iff the cell has a
    free 4-neighbor, so this needs only shifts — NO segment_sum/gather.
    (The previous segment_sum+gather formulation was miscompiled by
    XLA:TPU at batch >= ~1024 x 19k cells: it returned all-zero sizes,
    making every cell ineligible and failing config E's reset. Shifts
    also lower faster.) Border padding is obstacles, so jnp.roll wrap
    reads are always non-free."""
    big = p * p
    free = (components < big).reshape(p, p)
    nbr = (
        jnp.roll(free, 1, 0) | jnp.roll(free, -1, 0)
        | jnp.roll(free, 1, 1) | jnp.roll(free, -1, 1)
    )
    return (free & nbr).reshape(-1)


def place_agents_and_targets(cfg: StaticConfig, key, components):
    """Sample N distinct agent cells among free cells whose component has
    >= 2 cells, then for each agent a target: a uniform free cell of the
    same component, distinct from other targets and from the agent's own
    start (reachable by construction). Returns (agent_cells i32[N],
    target_cells i32[N], ok bool)."""
    p = cfg.padded_size
    n = cfg.num_agents
    big = p * p
    k_agents, k_targets = jax.random.split(key)

    eligible = multi_cell_component(components, p)
    scores = jnp.where(eligible, jax.random.uniform(k_agents, (big,)), -1.0)
    top_scores, agent_cells = lax.top_k(scores, n)
    agents_ok = jnp.all(top_scores >= 0.0)
    agent_cells = agent_cells.astype(jnp.int32)

    free = components < big
    cell_ids = jnp.arange(big, dtype=jnp.int32)

    def body(i, carry):
        used, targets, ok = carry
        comp = components[agent_cells[i]]
        mask = free & (components == comp) & ~used & (cell_ids != agent_cells[i])
        # Uniform choice over the mask = argmax of iid u32 random bits
        # (NOT gumbel: -log(-log u) is transcendental and XLA:CPU/TPU log
        # differ in the last ULP, flipping argmax ranks at scale — the
        # integer path is bit-identical across backends; ties are 2^-32
        # per pair and break to the first index on every backend).
        g = jax.random.bits(jax.random.fold_in(k_targets, i), (big,))
        sc = jnp.where(mask, g, jnp.uint32(0))
        c = jnp.argmax(sc).astype(jnp.int32)
        found = mask[c]
        # Elementwise compare+or, NOT used.at[c].set(True): XLA:TPU loses
        # ~half of the 1-element scatter updates inside this vmapped loop
        # at B >= ~1024 x 19k cells (used_pop 13 after 26 iterations;
        # CPU / small B are correct) — the third batched-scatter/scan
        # miscompile in this family (benchmarks/placement_probe.py).
        used = used | (cell_ids == c)
        targets = targets.at[i].set(c)
        return used, targets, ok & found

    used0 = jnp.zeros(big, bool)
    targets0 = jnp.zeros(n, jnp.int32)
    _, target_cells, targets_ok = lax.fori_loop(
        0, n, body, (used0, targets0, jnp.bool_(True))
    )
    return agent_cells, target_cells, agents_ok & targets_ok


def cells_to_xy(cells: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.stack([cells // p, cells % p], axis=-1).astype(jnp.int32)


def xy_to_cells(xy: jnp.ndarray, p: int) -> jnp.ndarray:
    return (xy[..., 0] * p + xy[..., 1]).astype(jnp.int32)


# ---------------------------------------------------------------------------
# LifeLong respawn table: O(1) on-device goal resampling
# ---------------------------------------------------------------------------


def build_respawn_table(components: jnp.ndarray, p: int):
    """Sort free cells by component so a uniform draw within a component is
    ``cells[offset[comp] + randint(count[comp])]``. Returns a dict of
    i32 arrays: cells[P*P] (sorted cell ids, obstacles last),
    offset[P*P+1] / count[P*P+1] (indexed by component label),
    rank[P*P] (position of each cell inside the sorted order).
    """
    big = p * p
    order = jnp.argsort(components, stable=True).astype(jnp.int32)
    rank = jnp.zeros(big, jnp.int32).at[order].set(jnp.arange(big, dtype=jnp.int32))
    pos = jnp.arange(big, dtype=jnp.int32)
    sorted_labels = components[order]
    offset = jax.ops.segment_min(pos, sorted_labels, num_segments=big + 1)
    ones = jnp.ones(big, jnp.int32)
    count = jax.ops.segment_sum(ones, sorted_labels, num_segments=big + 1)
    return {"cells": order, "offset": offset, "count": count, "rank": rank}


def build_target_queue(key, table, components, target_cells, queue_len: int, p: int):
    """i16[N, Q, 2] queue of future LifeLong goals per agent.

    Entry (n, k) is a uniform free cell of agent n's component with
    q_{k} != q_{k-1} (q_{-1} = the initial target), so when a goal is
    reached the queue head always differs from the cell the agent stands
    on — replacing upstream generate_new_target's "exclude current
    position" (pogema/generator.py) without a step-time gather. Uses the
    double-draw trick: two iid draws per slot, the second used when the
    first collides with the previous entry (the rare double collision is
    accepted — probability 1/|component|^2).

    Runs at reset only; the batched gathers here are off the hot path.
    """
    n = target_cells.shape[0]
    comp = components[target_cells]  # component per agent (target & start share it)
    off = table["offset"][comp]  # [N]
    cnt = table["count"][comp]
    k1, k2 = jax.random.split(key)
    shape = (n, queue_len)
    j1 = jax.random.randint(k1, shape, 0, jnp.maximum(cnt, 1)[:, None])
    j2 = jax.random.randint(k2, shape, 0, jnp.maximum(cnt, 1)[:, None])
    cells1 = table["cells"][off[:, None] + j1]  # [N, Q]
    cells2 = table["cells"][off[:, None] + j2]

    def body(prev, slot):
        c1, c2 = slot
        q = jnp.where(c1 != prev, c1, c2)
        return q, q

    _, queue = lax.scan(
        body, target_cells, (cells1.T, cells2.T)
    )  # [Q, N]
    queue = queue.T  # [N, Q]
    if queue_len >= 2:
        # Constrain the wrap seam: when an agent exhausts the queue it
        # rolls back to q_0, so q_{Q-1} must differ from q_0 too —
        # otherwise a wrapping agent could score every step standing
        # still. Use the unused alternative draw of the last slot when it
        # satisfies both neighbor constraints (rare double collision is
        # accepted, probability O(1/|component|^2)).
        q0, prev, last = queue[:, 0], queue[:, -2], queue[:, -1]
        alt1, alt2 = cells1[:, -1], cells2[:, -1]
        fix = jnp.where((alt2 != prev) & (alt2 != q0), alt2,
                        jnp.where((alt1 != prev) & (alt1 != q0), alt1, last))
        queue = queue.at[:, -1].set(jnp.where(last == q0, fix, last))
    # Degenerate single-cell components: stay on the initial target.
    queue = jnp.where(cnt[:, None] <= 1, target_cells[:, None], queue)
    # Packed flat cell ids; i16 when they fit (p <= 181) — the step-path
    # head lookup reads the whole [B, N, Q] queue each step, so entry
    # width is pure HBM traffic.
    dtype = jnp.int16 if p * p < 2**15 else jnp.int32
    return queue.astype(dtype)


def sample_new_target(key, table, components, agent_cell):
    """Uniform free cell of ``agent_cell``'s component, excluding the agent
    cell itself (= the just-reached goal). TPU-native replacement for
    upstream pogema/generator.py generate_new_target. O(1)."""
    comp = components[agent_cell]
    off = table["offset"][comp]
    cnt = table["count"][comp]
    ra = table["rank"][agent_cell] - off  # agent cell's index inside its comp
    # Draw from count-1 slots, remapping the agent's own slot to the last.
    j = jax.random.randint(key, (), 0, jnp.maximum(cnt - 1, 1))
    j = jnp.where(j == ra, cnt - 1, j)
    cell = table["cells"][off + j]
    # Degenerate single-cell component: stay on the agent cell.
    return jnp.where(cnt <= 1, agent_cell, cell).astype(jnp.int32)


# ---------------------------------------------------------------------------
# full env generation (map + components + placement), with bounded retry
# ---------------------------------------------------------------------------


def _make_map(cfg: StaticConfig, key, fixed_map, map_bank, maze: bool):
    if fixed_map is not None:
        return pad_grid(cfg, fixed_map)
    if map_bank is not None:
        idx = jax.random.randint(key, (), 0, map_bank.shape[0])
        return pad_grid(cfg, jnp.asarray(map_bank)[idx])
    grid = sidewinder_maze(cfg, key) if maze else bernoulli_obstacles(cfg, key)
    return pad_grid(cfg, grid)


def generate_env(
    cfg: StaticConfig,
    key,
    fixed_map=None,
    fixed_agents_xy=None,
    fixed_targets_xy=None,
    maze: bool = False,
    map_bank=None,
):
    """One env instance: (padded obstacles u8[P,P], agents_xy i32[N,2],
    targets_xy i32[N,2], components i32[P*P], ok bool). Retries the whole
    draw on degenerate maps (not enough mutually-reachable free cells),
    like the reference's host-side retry loop, but bounded and on-device.

    ``ok`` is False when every retry failed placement (e.g. a map with
    fewer mutually-reachable free cells than 2*num_agents); callers on the
    host (PogemaCore.reset / the rim) MUST check it and raise — the
    reference raises on unplaceable configs too.
    """
    p = cfg.padded_size
    r = cfg.obs_radius

    fixed_placement = fixed_agents_xy is not None

    def attempt(k):
        k_map, k_place = jax.random.split(k)
        grid = _make_map(cfg, k_map, fixed_map, map_bank, maze)
        if fixed_placement:
            # Explicit agents_xy/targets_xy on a RANDOM map: carve those
            # cells free so the draw can never bury them. (With an explicit
            # map the host rim validates overlap before tracing — see
            # PogemaCore.__init__ — and no carving happens here.)
            agents = jnp.asarray(fixed_agents_xy, jnp.int32) + r
            targets = jnp.asarray(fixed_targets_xy, jnp.int32) + r
            if fixed_map is None:
                for xy in (agents, targets):
                    grid = grid.at[xy[:, 0], xy[:, 1]].set(0)
            comps = connected_components(grid)
            return grid, agents, targets, comps, jnp.bool_(True)
        comps = connected_components(grid)
        a_cells, t_cells, ok = place_agents_and_targets(cfg, k_place, comps)
        return grid, cells_to_xy(a_cells, p), cells_to_xy(t_cells, p), comps, ok

    if fixed_placement and fixed_map is not None:
        grid, agents, targets, comps, ok = attempt(key)
        return grid, agents, targets, comps, ok

    # Single copy of the generation graph: the first attempt happens inside
    # the while_loop too (init carry is a dummy with ok=False), which keeps
    # the compiled program small.
    def cond(carry):
        _, ok, tries, _ = carry
        return ~ok & (tries < _MAX_TRIES)

    def body(carry):
        k, _, tries, _ = carry
        k, sub = jax.random.split(k)
        grid, agents, targets, comps, ok = attempt(sub)
        return k, ok, tries + 1, (grid, agents, targets, comps)

    n = cfg.num_agents
    dummy = (
        jnp.zeros((p, p), jnp.uint8),
        jnp.zeros((n, 2), jnp.int32),
        jnp.zeros((n, 2), jnp.int32),
        jnp.zeros(p * p, jnp.int32),
    )
    _, ok, _, (grid, agents, targets, comps) = lax.while_loop(
        cond, body, (key, jnp.bool_(False), jnp.int32(0), dummy)
    )
    return grid, agents, targets, comps, ok
