"""MXU-native window extraction and pairwise agent geometry.

THE key TPU design decision of this engine (SURVEY.md §7 "perf tuning"):
XLA:TPU lowers batched ``dynamic_slice``/gather with runtime indices to
one-at-a-time element gathers — measured ~42 ms per step for the
4096x64-agent observation tensor (config C). The same windows expressed
as one-hot row/column selector *matmuls* run on the 128x128 systolic MXU
in well under a millisecond: for window W, padded grid G [P, P],

    window[n, i, j] = sum_{p,q} onehot_x[n, i, p] * G[p, q] * onehot_y[n, j, q]

factored as two small einsums (row-select then column-select). One-hots
are bf16 (exact for 0/1 values), accumulation is f32
(``preferred_element_type``), so results are exact.

Likewise the agents-occupancy channel never touches a grid at all: with
N <= a few hundred agents, "which other agents are inside my window" is a
pairwise [N, N] computation — two one-hot outer factors contracted over
the *other-agent* axis on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _onehot(indices, size, dtype=jnp.bfloat16):
    """indices i32[...] -> one-hot [..., size]; out-of-range rows are all
    zero (clipping happens naturally: equality never fires)."""
    iota = jnp.arange(size, dtype=jnp.int32)
    return (indices[..., None] == iota).astype(dtype)


def extract_windows(grid, xy, w: int, dtype=jnp.float32):
    """Egocentric windows for one env on the MXU.

    grid: [P, P] (any numeric dtype; border-padded), xy: i32[N, 2] window
    centers, w: odd window size. Returns dtype[N, w, w] where
    out[n, i, j] = grid[xy[n,0]-r+i, xy[n,1]-r+j].

    Two batched einsums: row select [N, w, P]x[P, P], then per-agent
    column select [N, w, P]x[N, w, P]. Grouping several agents' stage-2
    selects into one fatter matmul (diagonal [w, w] blocks of a
    [gw, P]@[P, gw] product) was measured TWICE (r1 on CPU-derived
    reasoning, r2 on a real v5e: benchmarks/window_group_bench.py) and
    is 1.2-1.6x WORSE for every g in {2, 4, 8} — XLA's batched-matmul
    emitter already tiles the gsz=1 shape well, and the g x flop waste
    plus the diagonal relayout never pays for itself. See docs/DESIGN.md
    "Negative results"; the former ``group`` knob is deleted.
    """
    p = grid.shape[-1]
    r = w // 2
    ggrid = grid.astype(jnp.bfloat16)
    offs = jnp.arange(w, dtype=jnp.int32) - r
    rows = xy[:, 0:1] + offs[None, :]  # [N, w]
    cols = xy[:, 1:2] + offs[None, :]
    oh_r = _onehot(rows, p)  # [N, w, P]
    oh_c = _onehot(cols, p)
    # row select: [Nw, P] @ [P, P] -> [N, w, P]
    t1 = jnp.einsum(
        "nip,pq->niq", oh_r, ggrid, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    out = jnp.einsum(
        "niq,njq->nij", t1, oh_c, preferred_element_type=jnp.float32
    )
    return out.astype(dtype)


def pack_nibbles(grid):
    """u8[P, P] obstacle grid -> bf16[P, ceil(P/4)] with 4 columns per
    nibble (value 0-15 — exact in bf16): bit b of nibble j is column
    4j + b.

    Move validation only needs ONE bit per lookup, so contracting the
    row-select matmul against nibble-packed columns cuts its output (and
    the column-select traffic) 4x: measured 0.32 -> 0.17 ms/step at
    config C (benchmarks/point_lookup_probe.py, v6 vs v0 on a v5e; the
    lookup is HBM/layout-bound, not FLOP-bound). Obstacles are
    episode-invariant, so the packing runs once per reset and rides in
    ``EnvState.obstacle_nibbles``."""
    p = grid.shape[-1]
    pad = (-p) % 4
    g = jnp.pad(grid.astype(jnp.int32), ((0, 0), (0, pad)))
    g = g.reshape(p, -1, 4)
    weights = jnp.asarray([1, 2, 4, 8], jnp.int32)
    return jnp.sum(g * weights, axis=-1).astype(jnp.bfloat16)


def point_lookup_packed(grid_nib, xy):
    """Obstacle bit at N points from the nibble-packed grid, as f32[N]
    (0.0 or 1.0). Bit-exact with ``point_lookup(grid, xy)`` for 0/1
    grids (tests/test_api_modes.py)."""
    nib_cols = grid_nib.shape[-1]
    oh_r = _onehot(xy[:, 0], grid_nib.shape[0])  # [N, P]
    t1 = jnp.einsum(
        "np,pj->nj", oh_r, grid_nib, preferred_element_type=jnp.float32
    )  # [N, NIB], exact (one-hot row select of 0-15 values)
    col = xy[:, 1]
    oh_n = col[:, None] // 4 == jnp.arange(nib_cols, dtype=jnp.int32)
    nib = jnp.sum(jnp.where(oh_n, t1, 0.0), axis=-1).astype(jnp.int32)
    return ((nib >> (col % 4)) & 1).astype(jnp.float32)


def point_lookup(grid, xy):
    """grid values at N points, as f32[N] — the w=1 case (used for move
    validation). Same MXU trick, no gather."""
    p = grid.shape[-1]
    g = grid.astype(jnp.bfloat16)
    oh_r = _onehot(xy[:, 0], p)  # [N, P]
    oh_c = _onehot(xy[:, 1], p)
    t1 = jnp.einsum("np,pq->nq", oh_r, g, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "nq,nq->n", t1.astype(jnp.bfloat16), oh_c,
        preferred_element_type=jnp.float32,
    )


def neighborhoods3x3(grid, xy):
    """f32[N, 3, 3] neighborhoods — enough to validate all 5 moves."""
    return extract_windows(grid, xy, 3)


def batched_extract_windows(grids, xy, w: int, dtype=jnp.bfloat16):
    """Egocentric windows with an explicit leading batch axis.

    grids: [B, P, P] (each sample has its own grid — B is envs during a
    rollout or shuffled env-step samples during a PPO update), xy:
    i32[B, N, 2]. Returns dtype[B, N, w, w]. Same one-hot-einsum design
    as :func:`extract_windows` (and the same hardware-measured verdict
    on stage-2 grouping: always worse, knob deleted).
    """
    p = grids.shape[-1]
    r = w // 2
    g = grids.astype(jnp.bfloat16)
    offs = jnp.arange(w, dtype=jnp.int32) - r
    oh_r = _onehot(xy[..., 0:1] + offs, p)  # [B, N, w, P]
    oh_c = _onehot(xy[..., 1:2] + offs, p)
    t1 = jnp.einsum(
        "bnip,bpq->bniq", oh_r, g, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    out = jnp.einsum(
        "bniq,bnjq->bnij", t1, oh_c, preferred_element_type=jnp.float32
    )
    return out.astype(dtype)


def batched_occupancy_grid(xy, active, p: int, dtype=jnp.bfloat16):
    """[B, N, 2] + [B, N] -> dtype[B, P, P] agent-occupancy grids.

    occ[b, x, y] = 1 iff an active agent stands at (x, y) (cells are
    unique by the collision invariant, so the one-hot outer-product sum
    is 0/1 exactly). One einsum of two [B, N, P] one-hot factors — the
    grid-building dual of :func:`batched_pairwise_agent_windows`: with
    occ in hand, the agents-occupancy window is a plain
    :func:`batched_extract_windows` call that SHARES its row/column
    selectors with the obstacle-channel extraction (XLA CSE), instead
    of paying the pairwise [B, N, M, w] one-hot factors again."""
    ox = _onehot(xy[..., 0], p) * active[..., None].astype(jnp.bfloat16)
    oy = _onehot(xy[..., 1], p)
    out = jnp.einsum(
        "bnp,bnq->bpq", ox, oy, preferred_element_type=jnp.float32
    )
    return out.astype(dtype)


def batched_pairwise_agent_windows(xy, active, w: int, dtype=jnp.bfloat16):
    """[B, N, 2] + [B, N] -> dtype[B, N, w, w] agents-occupancy channels
    (batched :func:`pairwise_agent_windows`: self included, inactive
    agents invisible)."""
    r = w // 2
    dx = xy[:, None, :, 0] - xy[:, :, None, 0] + r  # [B, N, M]
    dy = xy[:, None, :, 1] - xy[:, :, None, 1] + r
    oh_dx = _onehot(dx, w) * active[:, None, :, None].astype(jnp.bfloat16)
    oh_dy = _onehot(dy, w)
    out = jnp.einsum(
        "bnmi,bnmj->bnij", oh_dx, oh_dy, preferred_element_type=jnp.float32
    )
    return out.astype(dtype)


def batched_target_onehot(agents_xy, targets_xy, w: int, dtype=jnp.bfloat16):
    """[B, N, 2] x2 -> dtype[B, N, w, w]: own goal marked, clamped onto
    the window border when outside (the reference's projection)."""
    r = w // 2
    rel = jnp.clip(targets_xy - agents_xy, -r, r) + r  # i32[B, N, 2]
    oh_x = _onehot(rel[..., 0], w)  # [B, N, w]
    oh_y = _onehot(rel[..., 1], w)
    return (oh_x[..., :, None] * oh_y[..., None, :]).astype(dtype)


def pairwise_agent_windows(xy, active, w: int, dtype=jnp.float32):
    """Agents-occupancy channel without any occupancy grid.

    out[n, i, j] = 1 iff some active agent stands at relative offset
    (i-r, j-r) from agent n (self included at the center). Computed as a
    pairwise one-hot contraction over the other-agent axis m:

        out[n, i, j] = sum_m oh_dx[n, m, i] * oh_dy[n, m, j]
    """
    r = w // 2
    dx = xy[None, :, 0] - xy[:, None, 0] + r  # [N, M]
    dy = xy[None, :, 1] - xy[:, None, 1] + r
    oh_dx = _onehot(dx, w) * active[None, :, None].astype(jnp.bfloat16)
    oh_dy = _onehot(dy, w)
    out = jnp.einsum(
        "nmi,nmj->nij", oh_dx, oh_dy, preferred_element_type=jnp.float32
    )
    # Two agents can never share a cell, so the sum is 0/1 already.
    return out.astype(dtype)
