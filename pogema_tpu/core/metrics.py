"""On-device episode metrics — same definitions as the reference's metric
wrappers (upstream: pogema/wrappers/metrics.py, SURVEY.md §2 "Metrics
wrappers"), computed as masked reductions over the batch axis instead of
host-side wrapper bookkeeping:

* ISR — individual success rate: fraction of agents that reached their
  goal ('finish'/'restart': ever during the episode; 'nothing': standing
  on it when the episode ends — the reference's "non-disappear" variant);
* CSR — cooperative success rate: 1.0 iff every agent succeeded;
* ep_length — steps taken;
* avg_throughput — LifeLong only: goals achieved per step, summed over
  agents.

Values are produced every step; they are *valid for an env only on the
step its episode ends* (the ``done`` mask from the API). The host rim
surfaces them into ``info['metrics']`` exactly like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..grid_config import StaticConfig
from .types import EnvState


def episode_metrics(cfg: StaticConfig, state: EnvState) -> dict:
    """Metrics for ONE env (caller vmaps). All entries f32 scalars."""
    steps = jnp.maximum(state.step_count, 1).astype(jnp.float32)
    out = {"ep_length": state.step_count.astype(jnp.float32)}
    if cfg.on_target == "restart":
        # LifeLong: ISR/CSR are undefined (episodes never "succeed"; the
        # reference gates its metric wrappers by mode) — the episode
        # metric is throughput.
        out["avg_throughput"] = jnp.sum(state.goals_achieved).astype(jnp.float32) / steps
        return out
    if cfg.on_target == "nothing":
        succeeded = jnp.all(state.agents_xy == state.targets_xy, axis=-1)
    else:
        succeeded = state.on_goal_ever
    out["ISR"] = jnp.mean(succeeded.astype(jnp.float32))
    out["CSR"] = jnp.all(succeeded).astype(jnp.float32)
    return out
