"""Observation assembly — vectorized counterpart of the reference's
per-agent window extraction (upstream: pogema/grid.py window getters +
pogema/envs.py ``_obtain_observations``, SURVEY.md §2 "Observations").

One env, no batch axis (caller vmaps).

TPU-native path (see ops/windows.py for the rationale and measurements):
* obstacle windows: one-hot row/column selector einsums on the MXU —
  batched ``dynamic_slice`` lowers to element-at-a-time gathers on TPU
  and measured ~50x slower at config-C scale;
* agents channel: pairwise [N, N] relative-offset one-hot contraction —
  no occupancy grid is ever materialized;
* target channel: analytic (clamped relative offset scattered into a
  [N, w, w] zeros — N items only).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..grid_config import StaticConfig
from ..ops.windows import extract_windows, pairwise_agent_windows


def target_channel(cfg: StaticConfig, agents_xy, targets_xy):
    """f32[N, W, W]: own goal marked in the window; goals outside the
    window are clamped onto its border (reference behavior, MED)."""
    r = cfg.obs_radius
    w = cfg.window
    n = cfg.num_agents
    rel = jnp.clip(targets_xy - agents_xy, -r, r) + r  # i32[N, 2] in [0, 2r]
    # One-hot outer product instead of an N-item scatter (TPU scatters
    # serialize; this is a fused VPU elementwise op).
    iota = jnp.arange(w, dtype=jnp.int32)
    oh_x = (rel[:, 0:1] == iota[None, :]).astype(jnp.float32)  # [N, w]
    oh_y = (rel[:, 1:2] == iota[None, :]).astype(jnp.float32)
    del n
    return oh_x[:, :, None] * oh_y[:, None, :]


def observe(cfg: StaticConfig, obstacles, agents_xy, targets_xy, active):
    """Build observations for one env according to cfg.observation_type.

    'default': f32[N, 3, W, W] — [obstacles, agents, own-target] channels.
    'POMAPF': dict of per-agent windows + global own/target coordinates.
    'MAPF': POMAPF + global obstacle map and all agents'/targets' coords.
    Coordinates in dict variants are *unpadded* (logical S×S grid) like the
    reference's ignore_borders getters.
    """
    r = cfg.obs_radius
    w = cfg.window

    obst_w = extract_windows(obstacles, agents_xy, w)
    agents_w = pairwise_agent_windows(agents_xy, active, w)

    if cfg.observation_type == "default":
        targ_w = target_channel(cfg, agents_xy, targets_xy)
        if cfg.obs_layout == "packed":
            # f32[N, 3*W*W]: channel blocks [obstacles|agents|target]
            # flattened row-major — a bit-exact reshape of the grid
            # layout (test-gated), but the minor dim 3*W*W (~363) is
            # near-tile-aligned where W=11 pays ~12x T(8,128) padding.
            # Built by concat of flat channels so the padded [N,3,W,W]
            # stack never materializes. External learners matmul it
            # directly: [.., 3*W*W] @ [3*W*W, E] is the embed GEMM.
            n = obst_w.shape[0]
            return jnp.concatenate(
                [obst_w.reshape(n, w * w), agents_w.reshape(n, w * w),
                 targ_w.reshape(n, w * w)], axis=-1)
        return jnp.stack([obst_w, agents_w, targ_w], axis=1)

    out = {
        "obstacles": obst_w,
        "agents": agents_w,
        "xy": agents_xy - r,
        "target_xy": targets_xy - r,
    }
    if cfg.observation_type == "MAPF":
        s = cfg.size
        out["global_obstacles"] = lax.dynamic_slice(obstacles, (r, r), (s, s))
        out["global_xy"] = agents_xy - r
        out["global_target_xy"] = targets_xy - r
    return out
