"""Debug-mode invariant checks (SURVEY.md §5 "Race detection /
sanitizers": the TPU-native equivalent is state validation + determinism
tests). Host-side, test/debug only — never on the jitted path."""

from __future__ import annotations

import numpy as np


def validate_state(cfg, state) -> list:
    """Returns a list of violation strings (empty = healthy). Checks the
    core invariants the reference guarantees: nobody on an obstacle, no
    two active agents on one cell, targets on free cells, coordinates in
    bounds, counters sane."""
    errors = []
    grid = np.asarray(state.obstacles)
    xy = np.asarray(state.agents_xy)
    targ = np.asarray(state.targets_xy)
    active = np.asarray(state.active)
    p = cfg.padded_size
    batch_shape = grid.shape[:-2]
    flat = int(np.prod(batch_shape)) if batch_shape else 1
    grid = grid.reshape(flat, p, p)
    xy = xy.reshape(flat, -1, 2)
    targ = targ.reshape(flat, -1, 2)
    active = active.reshape(flat, -1)

    for b in range(flat):
        if (xy[b] < 0).any() or (xy[b] >= p).any():
            errors.append(f"env {b}: agent out of bounds")
            continue
        if grid[b, xy[b, :, 0], xy[b, :, 1]].any():
            errors.append(f"env {b}: agent standing on an obstacle")
        if grid[b, targ[b, :, 0], targ[b, :, 1]].any():
            errors.append(f"env {b}: target on an obstacle")
        cells = [tuple(c) for c, a in zip(xy[b], active[b]) if a]
        if len(cells) != len(set(cells)):
            errors.append(f"env {b}: two active agents share a cell")
        r = cfg.obs_radius
        if (xy[b] < r).any() or (xy[b] >= p - r).any():
            errors.append(f"env {b}: agent inside the obstacle border")
    step = np.asarray(state.step_count)
    if (step < 0).any() or (step > cfg.max_episode_steps).any():
        errors.append("step_count out of range")
    return errors
