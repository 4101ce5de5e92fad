"""Host compatibility rim — the reference's user-facing classes
(upstream: pogema/envs.py — ``Pogema``, ``PogemaLifeLong``,
``PogemaCoopFinish``, ``pogema_v0`` factory; SURVEY.md §2 "Env semantics",
§3.1-3.3) as thin shims over the jitted vectorized core.

A ``Pogema`` object is a B=1 slice of :class:`pogema_tpu.core.PogemaCore`:
lists-in/lists-out Gymnasium multi-agent convention, NumPy at the edge,
device arrays inside. All semantics (collisions, rewards, termination,
truncation, metrics) live in the core; this layer only handles seeding
policy, host conversion, info/metrics dict assembly and rendering.
"""

from __future__ import annotations

import random as _pyrandom
from typing import Optional

import gymnasium
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from .core.api import PogemaCore
from .grid_config import NUM_ACTIONS, GridConfig


class ActionsSampler:
    """Uniform random action sampler with its own RNG (upstream exposes
    similar helpers for scripted rollouts)."""

    def __init__(self, num_actions: int = NUM_ACTIONS, seed: Optional[int] = None):
        self._num_actions = num_actions
        self._rng = np.random.default_rng(seed)

    def sample_actions(self, dim: int = 1):
        return self._rng.integers(self._num_actions, size=dim).tolist()


class Pogema(gymnasium.Env):
    """Multi-agent grid env, Gymnasium 5-tuple convention with per-agent
    lists (upstream: pogema/envs.py Pogema)."""

    metadata = {"render_modes": ["ansi"]}

    def __init__(self, grid_config: Optional[GridConfig] = None, **kwargs):
        if grid_config is None:
            grid_config = GridConfig(**kwargs)
        self.grid_config = grid_config
        self._core = PogemaCore(grid_config, num_envs=1)
        self._cfg = self._core.cfg
        self._state = None
        self._episode = 0
        self._base_seed = (
            grid_config.seed
            if grid_config.seed is not None
            else _pyrandom.randint(0, 2**31 - 1)
        )
        self._fresh_each_reset = grid_config.seed is None

        w = self._cfg.window
        self.action_space = spaces.Discrete(NUM_ACTIONS)
        if self._cfg.observation_type == "default":
            self.observation_space = spaces.Box(0.0, 1.0, shape=(3, w, w))
        else:
            d = {
                "obstacles": spaces.Box(0.0, 1.0, shape=(w, w)),
                "agents": spaces.Box(0.0, 1.0, shape=(w, w)),
                "xy": spaces.Box(-1024, 1024, shape=(2,), dtype=int),
                "target_xy": spaces.Box(-1024, 1024, shape=(2,), dtype=int),
            }
            if self._cfg.observation_type == "MAPF":
                s = self._cfg.size
                n = self._cfg.num_agents
                d["global_obstacles"] = spaces.Box(0.0, 1.0, shape=(s, s))
                d["global_xy"] = spaces.Box(-1024, 1024, shape=(n, 2), dtype=int)
                d["global_target_xy"] = spaces.Box(-1024, 1024, shape=(n, 2), dtype=int)
            self.observation_space = spaces.Dict(d)

    # -- properties mirroring the reference surface ----------------------

    @property
    def num_agents(self) -> int:
        return self._cfg.num_agents

    def get_num_agents(self) -> int:
        return self.num_agents

    @property
    def is_multiagent(self) -> bool:
        return True

    # -- seeding ---------------------------------------------------------

    def _episode_key(self):
        base = self._core.make_key(self._base_seed)
        if self._fresh_each_reset:
            return jax.random.fold_in(base, self._episode)
        return base

    # -- gym API ---------------------------------------------------------

    def reset(self, seed: Optional[int] = None, options=None, **kwargs):
        if seed is not None:
            self._base_seed = seed
            self._fresh_each_reset = False
        self._state, obs = self._core.reset(self._episode_key())
        self._episode += 1
        return self._split_obs(obs), self._fresh_infos()

    def step(self, actions):
        acts = np.asarray(actions, np.int32)[None, :]
        self._state, res, done, mets = self._core.step(self._state, acts)
        obs = self._split_obs(res.observations)
        rewards = np.asarray(res.rewards[0]).astype(float).tolist()
        terminated = np.asarray(res.terminated[0]).astype(bool).tolist()
        truncated = np.asarray(res.truncated[0]).astype(bool).tolist()
        infos = self._fresh_infos()
        if bool(done[0]):
            metrics = {k: float(v[0]) for k, v in mets.items()}
            for info in infos:
                info["metrics"] = dict(metrics)
        return obs, rewards, terminated, truncated, infos

    def _fresh_infos(self):
        return [{} for _ in range(self.num_agents)]

    def _split_obs(self, obs):
        if self._cfg.observation_type == "default":
            arr = np.asarray(obs[0])
            return [arr[i] for i in range(self.num_agents)]
        host = jax.tree.map(lambda a: np.asarray(a)[0], obs)
        out = []
        for i in range(self.num_agents):
            d = {
                "obstacles": host["obstacles"][i],
                "agents": host["agents"][i],
                "xy": host["xy"][i],
                "target_xy": host["target_xy"][i],
            }
            if self._cfg.observation_type == "MAPF":
                d["global_obstacles"] = host["global_obstacles"]
                d["global_xy"] = host["global_xy"]
                d["global_target_xy"] = host["global_target_xy"]
            out.append(d)
        return out

    # -- reference Grid accessors (upstream: pogema/grid.py) -------------

    def get_obstacles(self, ignore_borders: bool = True):
        g = np.asarray(self._state.obstacles[0])
        if ignore_borders:
            r = self._cfg.obs_radius
            g = g[r:-r, r:-r]
        return g.copy()

    def get_agents_xy(self, only_active: bool = False, ignore_borders: bool = True):
        xy = np.asarray(self._state.agents_xy[0])
        active = np.asarray(self._state.active[0])
        if ignore_borders:
            xy = xy - self._cfg.obs_radius
        out = [tuple(map(int, p)) for p in xy]
        if only_active:
            out = [p for p, a in zip(out, active) if a]
        return out

    def get_targets_xy(self, only_active: bool = False, ignore_borders: bool = True):
        xy = np.asarray(self._state.targets_xy[0])
        active = np.asarray(self._state.active[0])
        if ignore_borders:
            xy = xy - self._cfg.obs_radius
        out = [tuple(map(int, p)) for p in xy]
        if only_active:
            out = [p for p, a in zip(out, active) if a]
        return out

    def get_lifelong_targets_xy(self, ignore_borders: bool = True):
        return self.get_targets_xy(ignore_borders=ignore_borders)

    def has_obstacle(self, x: int, y: int, ignore_borders: bool = True) -> bool:
        """True iff cell (x, y) is an obstacle (upstream: Grid.has_obstacle,
        SURVEY.md §2 "Grid state"). Coordinates follow the same convention
        as :meth:`get_obstacles`: logical map coords with
        ``ignore_borders=True`` (default), padded coords otherwise."""
        if ignore_borders:
            r = self._cfg.obs_radius
            x, y = x + r, y + r
        grid = np.asarray(self._state.obstacles[0])
        # Explicit range check: numpy would silently WRAP negative
        # indices to the far border (wrong answer) while over-large ones
        # raise — make both directions raise consistently.
        if not (0 <= x < grid.shape[0] and 0 <= y < grid.shape[1]):
            raise IndexError(
                f"cell ({x}, {y}) outside the "
                f"{'padded ' if not ignore_borders else ''}grid "
                f"{grid.shape}"
            )
        return bool(grid[x, y])

    def hide_agent(self, agent_idx: int) -> bool:
        """Deactivate one agent: it vanishes from other agents' observation
        windows and no longer moves or blocks (upstream: Grid.hide_agent —
        the disappear-on-finish primitive, SURVEY.md §2 "Grid state").
        Returns True on success (False for an out-of-range index)."""
        return self._set_agent_visibility(agent_idx, False)

    def show_agent(self, agent_idx: int) -> bool:
        """Re-activate an agent previously hidden with :meth:`hide_agent`
        (upstream: Grid.show_agent)."""
        return self._set_agent_visibility(agent_idx, True)

    def _set_agent_visibility(self, agent_idx: int, value: bool) -> bool:
        if not 0 <= agent_idx < self.num_agents:
            return False
        active = np.asarray(self._state.active).copy()
        active[0, agent_idx] = value
        self._state = self._state.replace(active=jnp.asarray(active))
        return True

    def get_state(self):
        """Flat global state vector (used by the PyMARL integration)."""
        g = self.get_obstacles().astype(np.float32).reshape(-1)
        r = self._cfg.obs_radius
        xy = (np.asarray(self._state.agents_xy[0]) - r).astype(np.float32).reshape(-1)
        txy = (np.asarray(self._state.targets_xy[0]) - r).astype(np.float32).reshape(-1)
        active = np.asarray(self._state.active[0]).astype(np.float32)
        return np.concatenate([g, xy, txy, active])

    @property
    def active(self):
        return {i: bool(a) for i, a in enumerate(np.asarray(self._state.active[0]))}

    # -- rendering -------------------------------------------------------

    def render(self):
        """ANSI render like the reference's console output: obstacles '#',
        free '.', agents 'A'-style indices, targets lowercase."""
        from .utils.render import render_ansi

        out = render_ansi(
            self.get_obstacles(),
            self.get_agents_xy(),
            self.get_targets_xy(),
            [bool(a) for a in np.asarray(self._state.active[0])],
        )
        print(out)
        return out


class PogemaLifeLong(Pogema):
    """LifeLong MAPF: reached goals respawn (upstream: pogema/envs.py)."""

    def __init__(self, grid_config: Optional[GridConfig] = None, **kwargs):
        if grid_config is None:
            grid_config = GridConfig(**kwargs)
        if grid_config.on_target != "restart":
            grid_config = grid_config.model_copy(update={"on_target": "restart"})
        super().__init__(grid_config)


class PogemaCoopFinish(Pogema):
    """Cooperative-finish MAPF: success = all agents on goals at once
    (upstream: pogema/envs.py, on_target='nothing')."""

    def __init__(self, grid_config: Optional[GridConfig] = None, **kwargs):
        if grid_config is None:
            grid_config = GridConfig(**kwargs)
        if grid_config.on_target != "nothing":
            grid_config = grid_config.model_copy(update={"on_target": "nothing"})
        super().__init__(grid_config)


def _make_pogema(grid_config: GridConfig) -> Pogema:
    if grid_config.on_target == "restart":
        return PogemaLifeLong(grid_config)
    if grid_config.on_target == "nothing":
        return PogemaCoopFinish(grid_config)
    return Pogema(grid_config)


def _make_pogema_gym_entry(grid_config: Optional[GridConfig] = None, **kwargs):
    """gymnasium.make('Pogema-v0', grid_config=...) entry point."""
    if grid_config is None:
        grid_config = GridConfig(**kwargs)
    return pogema_v0(grid_config)


def pogema_v0(grid_config: Optional[GridConfig] = None, **kwargs):
    """Factory — the reference package's single entry point (upstream:
    pogema/envs.py pogema_v0): builds the env for ``grid_config.on_target``
    and wraps it for ``grid_config.integration``."""
    if grid_config is None:
        grid_config = GridConfig(**kwargs)
    env = _make_pogema(grid_config)
    if grid_config.persistent:
        from .wrappers.persistence import PersistentWrapper

        env = PersistentWrapper(env)
    integration = grid_config.integration
    auto_reset = grid_config.auto_reset
    if auto_reset and integration not in (None, "gymnasium", "SampleFactory"):
        raise ValueError(
            f"auto_reset=True is not supported with "
            f"integration={integration!r}: that adapter owns the reset "
            "cycle (PARITY_RISKS.md row 15)"
        )
    if auto_reset:
        # Generic episode auto-reset on the lists rim (same wrapper the
        # SampleFactory integration uses); applied before any adapter.
        from .integrations.sample_factory import AutoResetWrapper

        env = AutoResetWrapper(env)
    if integration is None:
        return env
    if integration == "gymnasium":
        from .integrations.single_agent import SingleAgentWrapper

        return SingleAgentWrapper(env) if grid_config.num_agents == 1 else env
    if integration == "PettingZoo":
        from .integrations.pettingzoo import parallel_env

        return parallel_env(env)
    if integration == "PyMARL":
        from .integrations.pymarl import PyMarlPogema

        return PyMarlPogema(env)
    if integration == "SampleFactory":
        from .integrations.sample_factory import (
            AutoResetWrapper,
            IsMultiAgentWrapper,
            MetricsForwardingWrapper,
        )

        env = MetricsForwardingWrapper(IsMultiAgentWrapper(env))
        # SampleFactory's contract wants auto-reset by default;
        # auto_reset=False opts out, auto_reset=True already wrapped above.
        if auto_reset is None:
            env = AutoResetWrapper(env)
        return env
    if integration == "rllib":
        from .integrations.rllib import RLlibPogema

        return RLlibPogema(env)
    raise ValueError(f"unknown integration {integration!r}")
