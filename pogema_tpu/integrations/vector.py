"""Vectorized NumPy adapter for non-JAX frameworks.

The reference has no vectorization layer — users vectorize with external
tools (SURVEY.md §1); external learners (SampleFactory, CleanRL, SB3)
consume batched NumPy arrays. :class:`PogemaVectorEnv` is a
``gymnasium.vector.VectorEnv`` over :class:`~pogema_tpu.core.api.
PogemaCore`: B envs × N agents advance in ONE jitted XLA program per
call, and the host sees flat ``[B*N, ...]`` NumPy arrays — each agent
slot is one "vector env" (``single_action_space=Discrete(5)``), which is
exactly the batch shape an external PPO consumes.

Design notes (TPU-first):

* One device→host fetch per step: the jitted auto-reset step returns
  (obs, pre-reset obs, rewards, flags, done, metrics) as one tuple and
  ``jax.device_get`` pulls it in a single transfer. Per-step Python cost
  is the fetch — the measured materialized-obs ceiling at config-C shape
  (benchmarks/RESULTS.md "obs consumption") is ~289-530k env-steps/s vs
  10.2M obs-free; this adapter is how external frameworks reach it.
* ``obs_layout='packed'`` gives ``[B*N, 3*W*W]`` float rows (bit-exact
  reshape of the grid layout, matmul-ready, ~tile-aligned minor dim).
* Auto-reset follows gymnasium's ``AutoresetMode.SAME_STEP``: when an
  episode ends, the returned obs are the FIRST obs of the new episode;
  the terminal obs land in ``infos["final_obs"]`` (mask
  ``infos["_final_obs"]``) and the episode metrics (ISR/CSR/ep_length,
  avg_throughput for LifeLong) in ``infos["metrics/<k>"]`` (mask
  ``infos["_metrics"]``), broadcast per agent slot.

Upstream parity anchor: pogema/integrations/sample_factory.py is the
reference's only auto-reset consumer (B=1); this generalizes it to B
envs per call.
"""

from __future__ import annotations

from typing import Optional

import gymnasium
import jax
import numpy as np
from gymnasium import spaces
from gymnasium.vector import AutoresetMode, VectorEnv

from ..grid_config import NUM_ACTIONS, GridConfig


class PogemaVectorEnv(VectorEnv):
    """``num_envs`` in the gymnasium sense is ``num_vec_envs *
    grid_config.num_agents`` (one slot per agent). Supports the
    'default' (per-agent window tensors) and 'POMAPF' (dict of
    per-agent windows + coordinates) observation types."""

    metadata = {"autoreset_mode": AutoresetMode.SAME_STEP,
                "render_modes": []}

    def __init__(
        self,
        grid_config: Optional[GridConfig] = None,
        num_vec_envs: int = 64,
        obs_layout: str = "grid",
        obs_dtype=None,
        auto_reset_mode: str = "cached",
        maze: bool = False,
        map_bank=None,
        device: str = "auto",
        **kwargs,
    ):
        from ..core.api import PogemaCore

        if grid_config is None:
            grid_config = GridConfig(**kwargs)
        if grid_config.observation_type not in ("default", "POMAPF"):
            raise ValueError(
                "PogemaVectorEnv supports observation_type='default' "
                "(per-agent window tensors) and 'POMAPF' (dict of "
                "per-agent windows + coordinates); 'MAPF' has per-ENV "
                "global leaves (global_obstacles [S,S]) that the "
                "one-slot-per-agent vector layout would duplicate "
                "num_agents times — centralized consumers should drive "
                "PogemaCore directly"
            )
        self.grid_config = grid_config
        self._core = PogemaCore(
            grid_config,
            num_envs=num_vec_envs,
            auto_reset_mode=auto_reset_mode,
            maze=maze,
            map_bank=map_bank,
            obs_dtype=obs_dtype,
            device=device,
            obs_layout=obs_layout,
        )
        cfg = self._core.cfg
        self.num_vec_envs = int(num_vec_envs)
        self.num_agents = cfg.num_agents
        self.num_envs = self.num_vec_envs * self.num_agents
        w = cfg.window
        obs_shape = (3 * w * w,) if obs_layout == "packed" else (3, w, w)
        # Non-standard float dtypes (bf16) stay on the WIRE — they halve
        # the device->host transfer, which dominates the adapter's step
        # cost — but the host-facing space/arrays are float32 (gymnasium
        # Box and most external frameworks reject bfloat16).
        try:
            dt = np.dtype(obs_dtype if obs_dtype is not None else np.float32)
            if dt.kind not in "fiub":
                dt = np.dtype(np.float32)
        except TypeError:
            dt = np.dtype(np.float32)
        self._host_obs_dtype = dt
        if cfg.observation_type == "POMAPF":
            # All POMAPF leaves are fixed-shape PER AGENT, so they batch
            # into a Dict space over agent slots. Coordinates are
            # unpadded logical grid coords (reference ignore_borders
            # getters): active agents lie in [0, size); r is headroom
            # for any border-parked inactive slot.
            r, s = cfg.obs_radius, cfg.size
            self.single_observation_space = spaces.Dict({
                "obstacles": spaces.Box(0.0, 1.0, shape=(w, w), dtype=dt),
                "agents": spaces.Box(0.0, 1.0, shape=(w, w), dtype=dt),
                "xy": spaces.Box(-r, s - 1 + r, shape=(2,), dtype=np.int32),
                "target_xy": spaces.Box(-r, s - 1 + r, shape=(2,),
                                        dtype=np.int32),
            })
            self.observation_space = gymnasium.vector.utils.batch_space(
                self.single_observation_space, self.num_envs)
        else:
            self.single_observation_space = spaces.Box(
                0.0, 1.0, shape=obs_shape, dtype=dt)
            self.observation_space = spaces.Box(
                0.0, 1.0, shape=(self.num_envs,) + obs_shape, dtype=dt)
        self.single_action_space = spaces.Discrete(NUM_ACTIONS)
        self.action_space = spaces.MultiDiscrete(
            np.full(self.num_envs, NUM_ACTIONS))

        self._state = None
        self._initial_state = None
        self._episode = 0
        self._base_seed = (grid_config.seed if grid_config.seed is not None
                           else int(np.random.SeedSequence().entropy % 2**31))

    # -- helpers ----------------------------------------------------------

    def _flat(self, x):
        """[B, N, ...] -> [B*N, ...] NumPy view."""
        a = np.asarray(x)
        return a.reshape((self.num_envs,) + a.shape[2:])

    def _host_obs(self, x):
        if isinstance(x, dict):
            # Float leaves (windows) follow the host obs dtype; integer
            # leaves (coordinates) stay int32.
            return {k: self._host_obs(v) if np.asarray(v).dtype.kind == "f"
                    else self._flat(v).astype(np.int32)
                    for k, v in x.items()}
        a = self._flat(x)
        if a.dtype != self._host_obs_dtype:
            a = a.astype(self._host_obs_dtype)
        return a

    # -- gymnasium VectorEnv API ------------------------------------------

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._base_seed = int(seed)
            self._episode = 0
        key = self._core.make_key(self._base_seed)
        if self._episode:
            key = jax.random.fold_in(key, self._episode)
        self._episode += 1
        self._state, obs = self._core.reset(key)
        self._initial_state = self._state
        return self._host_obs(obs), {}

    def step(self, actions):
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        acts = np.asarray(actions, np.int32).reshape(
            self.num_vec_envs, self.num_agents)
        self._state, obs, res, done, metrics = self._core.step_autoreset(
            self._state, self._initial_state, acts)
        # Single bundled device->host fetch (per-leaf np.asarray would pay
        # one tunneled transfer each).
        obs, fin_obs, rew, term, trunc, done, metrics = jax.device_get(
            (obs, res.observations, res.rewards, res.terminated,
             res.truncated, done, metrics))
        infos = {}
        if done.any():
            mask = np.repeat(done, self.num_agents)
            # SAME_STEP contract: terminal observations of the ended
            # episodes (the returned obs are already post-reset).
            host_fin = self._host_obs(fin_obs)
            if isinstance(host_fin, dict):
                infos["final_obs"] = {
                    k: np.where(mask.reshape((-1,) + (1,) * (v.ndim - 1)),
                                v, 0).astype(v.dtype)
                    for k, v in host_fin.items()}
            else:
                infos["final_obs"] = np.where(
                    mask.reshape((-1,) + (1,) * (host_fin.ndim - 1)),
                    host_fin, 0).astype(self._host_obs_dtype)
            infos["_final_obs"] = mask
            infos["_metrics"] = mask
            for k, v in metrics.items():
                infos[f"metrics/{k}"] = np.repeat(
                    np.where(done, v, 0.0), self.num_agents)
        return (self._host_obs(obs), self._flat(rew).astype(np.float32),
                self._flat(term), self._flat(trunc), infos)

    def close_extras(self, **kwargs):
        self._state = self._initial_state = None
