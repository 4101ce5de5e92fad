"""Observation assembly — vectorized counterpart of the reference's
per-agent window extraction (upstream: pogema/grid.py window getters +
pogema/envs.py ``_obtain_observations``, SURVEY.md §2 "Observations").

One env, no batch axis (caller vmaps). Windows are (2r+1)×(2r+1) slices of
the obstacle-border-padded grid, taken with ``lax.dynamic_slice`` vmapped
over agents — XLA lowers the batch of slices to one gather, so the whole
observation tensor for N agents is a single fused op on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..grid_config import StaticConfig


def _windows(grid, agents_xy, w, r):
    """f32[N, W, W]: per-agent egocentric windows of a [P, P] grid."""

    def one(xy):
        return lax.dynamic_slice(grid, (xy[0] - r, xy[1] - r), (w, w))

    return jax.vmap(one)(agents_xy).astype(jnp.float32)


def agents_occupancy(cfg: StaticConfig, agents_xy, active):
    """u8[P, P]: 1 where an *active* agent stands (hidden agents excluded,
    matching the reference's hide_agent behavior)."""
    p = cfg.padded_size
    cells = agents_xy[..., 0] * p + agents_xy[..., 1]
    occ = jnp.zeros(p * p, jnp.uint8).at[cells].max(active.astype(jnp.uint8))
    return occ.reshape(p, p)


def target_channel(cfg: StaticConfig, agents_xy, targets_xy):
    """f32[N, W, W]: own goal marked in the window; goals outside the
    window are clamped onto its border (reference behavior, MED)."""
    r = cfg.obs_radius
    w = cfg.window
    n = cfg.num_agents
    rel = jnp.clip(targets_xy - agents_xy, -r, r) + r  # i32[N, 2] in [0, 2r]
    ch = jnp.zeros((n, w, w), jnp.float32)
    return ch.at[jnp.arange(n), rel[:, 0], rel[:, 1]].set(1.0)


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
    grid_f = obstacles.astype(jnp.float32)
    occ = agents_occupancy(cfg, agents_xy, active).astype(jnp.float32)

    obst_w = _windows(grid_f, agents_xy, w, r)
    agents_w = _windows(occ, agents_xy, w, r)

    if cfg.observation_type == "default":
        targ_w = target_channel(cfg, agents_xy, targets_xy)
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
