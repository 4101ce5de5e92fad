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


def extract_windows(grid, xy, w: int, dtype=jnp.float32, group: int = 1):
    """Egocentric windows for one env on the MXU.

    grid: [P, P] (any numeric dtype; border-padded), xy: i32[N, 2] window
    centers, w: odd window size. Returns dtype[N, w, w] where
    out[n, i, j] = grid[xy[n,0]-r+i, xy[n,1]-r+j].

    Stage 1 (row select) is one well-shaped matmul per env. Stage 2
    (column select) is where naive batching dies: per-agent [w, P]@[P, w]
    matmuls are 262k tiny MXU passes at config-C scale (~9 ms measured).
    Instead agents are processed in groups of ``group``: one
    [g*w, P]@[P, g*w] matmul per group computes all within-group
    agent-pair blocks and the diagonal blocks (a regular strided
    ``jnp.diagonal``) are the windows — g x fewer, far fatter MXU calls
    at g x flop waste, a large net win (measured ~4x).
    """
    p = grid.shape[-1]
    n = xy.shape[0]
    r = w // 2
    ggrid = grid.astype(jnp.bfloat16)
    gsz = max(1, min(group, n))
    n_pad = (-n) % gsz
    if n_pad:
        xy = jnp.concatenate(
            [xy, jnp.full((n_pad, 2), r, xy.dtype)], axis=0
        )
    ng = (n + n_pad) // gsz

    offs = jnp.arange(w, dtype=jnp.int32) - r
    rows = xy[:, 0:1] + offs[None, :]  # [N', w]
    cols = xy[:, 1:2] + offs[None, :]
    oh_r = _onehot(rows, p)  # [N', w, P]
    oh_c = _onehot(cols, p)
    # row select: [N'w, P] @ [P, P] -> [N', w, P]
    t1 = jnp.einsum(
        "nip,pq->niq", oh_r, ggrid, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    # grouped column select: [ng, gsz*w, P] x [ng, gsz*w, P] -> diag blocks
    t1g = t1.reshape(ng, gsz * w, p)
    ohcg = oh_c.reshape(ng, gsz * w, p)
    big = jnp.einsum(
        "gip,gjp->gij", t1g, ohcg, preferred_element_type=jnp.float32
    )  # [ng, gsz*w, gsz*w]
    blocks = big.reshape(ng, gsz, w, gsz, w)
    diag = jnp.diagonal(blocks, axis1=1, axis2=3)  # [ng, w, w, gsz]
    out = jnp.moveaxis(diag, -1, 1).reshape(-1, w, w)
    return out[:n].astype(dtype)


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
