"""Vectorized public core API.

This layer has NO counterpart in the reference (SURVEY.md §1: "the
reference has no vectorization layer") — it is the new first-class TPU
dimension: ``reset``/``step`` from ``core.step`` vmapped over a batch of
env instances and jitted, so B envs × N agents advance in one XLA program
with zero host round-trips. The batch axis is the axis that shards over a
``Mesh('data')`` for multi-chip runs (see ``pogema_tpu.parallel``).

Auto-reset (in-step episode restart, SURVEY.md §7 ``autoreset.py``) comes
in two flavors:

* ``'cached'`` (default): finished envs are restored to their cached
  reset-time state — zero extra compute per step (the standard JAX vec-env
  idiom, cf. Brax/gymnax). Maps/placements repeat per env across episodes,
  and so does the LifeLong respawn queue (it is pre-sampled at reset and
  restored verbatim, so every cached-mode episode replays the identical
  goal sequence). For LifeLong training prefer ``'regen'`` — episodes end
  synchronously at the time limit there, so the regeneration cost is paid
  exactly once per episode, and maps/placements/respawns all differ.
* ``'regen'``: finished envs get a freshly generated map+placement. The
  regeneration runs under a batch-level ``lax.cond`` so it costs nothing
  on steps where no env finished (ideal when episodes end synchronously at
  the time limit, e.g. LifeLong).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..grid_config import GridConfig, StaticConfig
from . import metrics as metrics_mod
from . import step as step_mod
from .types import EnvState


def _resolve_host_device():
    """The host (CPU) XLA device, registering the cpu platform alongside
    the accelerator platform if needed. Returns None when unavailable
    (callers then stay on the default backend)."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        pass
    try:
        plats = jax.config.jax_platforms
        if plats and "cpu" not in plats.split(","):
            jax.config.update("jax_platforms", plats + ",cpu")
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


class PogemaCore:
    """Batched functional environment: holds only static config + jitted
    callables; all state is explicit (pure pytrees in, pytrees out)."""

    def __init__(
        self,
        grid_config: GridConfig,
        num_envs: int = 1,
        auto_reset_mode: str = "cached",
        maze: bool = False,
        map_bank: Optional[np.ndarray] = None,
        obs_dtype=None,
        device: str = "auto",
        obs_layout: str = "grid",
    ):
        """obs_dtype: cast float observation leaves (default f32 for
        reference parity; pass jnp.bfloat16 to halve HBM traffic on the
        learner path — the obs tensor dominates rollout cost).

        device: dispatch policy. Tiny workloads (B*N small) are
        latency-bound, not FLOP-bound: on an accelerator every step pays
        per-op/dispatch overhead (~50 us/step for config A on a v5e, vs
        ~2 us of actual work), so 'auto' routes envs with
        num_envs * num_agents <= 16 to the host XLA (CPU) backend — the
        same jitted program, bit-exact by the verified cross-backend
        guarantee (docs/DESIGN.md "Determinism"). 'cpu' forces host,
        'default' forces the default (accelerator) backend."""
        self.grid_config = grid_config
        self.cfg: StaticConfig = grid_config.to_static()
        if obs_layout != "grid":
            # 'packed': f32[B, N, 3*W*W] observations (bit-exact reshape
            # of the grid layout, minor dim ~tile-aligned) — the fast
            # path for consumers of materialized obs; only meaningful
            # for the 'default' obs type (dict variants keep their own
            # leaf shapes).
            kv = {k: getattr(self.cfg, k) for k in StaticConfig.__slots__}
            kv["obs_layout"] = obs_layout
            self.cfg = StaticConfig(**kv)
        self.num_envs = int(num_envs)
        if auto_reset_mode not in ("cached", "regen"):
            raise ValueError("auto_reset_mode must be 'cached' or 'regen'")
        self.auto_reset_mode = auto_reset_mode
        self.obs_dtype = obs_dtype
        if device == "auto":
            want_host = self.num_envs * self.cfg.num_agents <= 16
            if want_host:
                # Routing only makes sense single-process and when the
                # default backend is a (remote) accelerator: under
                # multi-process the first cpu device may belong to
                # another process, and on a cpu default backend there is
                # nothing to win.
                try:
                    want_host = (jax.process_count() == 1
                                 and jax.default_backend() != "cpu")
                except Exception:
                    want_host = False
        elif device in ("cpu", "host"):
            want_host = True
        elif device == "default":
            want_host = False
        else:
            raise ValueError("device must be 'auto', 'cpu', or 'default'")
        self._host_device = _resolve_host_device() if want_host else None

        cfg_chk = self.cfg
        if grid_config.map is None and grid_config.agents_xy is None:
            # Soft host-side heuristic only: the hard failure signal is the
            # on-device placement_ok flag checked after reset (expected
            # free-cell counts both falsely reject tight-but-feasible
            # configs and pass configs whose actual draws fail).
            expected_free = cfg_chk.size * cfg_chk.size * (1.0 - cfg_chk.density)
            if expected_free < 2.0 * cfg_chk.num_agents:
                import warnings

                warnings.warn(
                    f"config is unlikely to fit {cfg_chk.num_agents} "
                    f"agents+targets: ~{expected_free:.0f} free cells "
                    f"expected on a {cfg_chk.size}x{cfg_chk.size} grid at "
                    f"density {cfg_chk.density}; reset() will raise if "
                    f"placement actually fails",
                    stacklevel=2,
                )

        cfg = self.cfg
        fixed_map = None
        if grid_config.map is not None:
            m = np.asarray(grid_config.map, np.uint8)
            if m.shape != (cfg.size, cfg.size):
                padded = np.ones((cfg.size, cfg.size), np.uint8)
                padded[: m.shape[0], : m.shape[1]] = m
                m = padded
            # numpy on purpose: host constants fold into the jitted program
            # without a device round-trip at lowering time.
            fixed_map = m
        fixed_agents = (
            np.asarray(grid_config.agents_xy, np.int32)[: cfg.num_agents]
            if grid_config.agents_xy is not None
            else None
        )
        fixed_targets = (
            np.asarray(grid_config.targets_xy, np.int32)[: cfg.num_agents]
            if grid_config.targets_xy is not None
            else None
        )
        if fixed_map is not None and fixed_agents is not None:
            # Explicit placements on an explicit map: validate on the host
            # instead of silently carving cells free (the reference raises
            # on agents/targets placed on obstacles).
            for label, pts in (("agents_xy", fixed_agents),
                               ("targets_xy", fixed_targets)):
                if pts is None:
                    continue
                if (pts < 0).any() or (pts >= cfg.size).any():
                    raise ValueError(f"{label} out of bounds for a "
                                     f"{cfg.size}x{cfg.size} map: {pts.tolist()}")
                on_obst = fixed_map[pts[:, 0], pts[:, 1]] != 0
                if on_obst.any():
                    bad = pts[on_obst].tolist()
                    raise ValueError(f"{label} placed on obstacle cells: {bad}")
            for label, pts in (("agents_xy", fixed_agents),
                               ("targets_xy", fixed_targets)):
                if pts is not None and len({tuple(p) for p in pts.tolist()}) < len(pts):
                    raise ValueError(f"duplicate cells in {label}: {pts.tolist()}")
        bank = np.asarray(map_bank, np.uint8) if map_bank is not None else None

        def reset_env(key):
            return step_mod.reset_one(
                cfg, key, fixed_map, fixed_agents, fixed_targets, maze, bank
            )

        self._reset_env = reset_env
        obs_dtype_ = obs_dtype

        def cast_obs(obs):
            if obs_dtype_ is None:
                return obs
            return jax.tree.map(
                lambda x: x.astype(obs_dtype_)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                obs,
            )

        self._cast_obs = cast_obs

        @jax.jit
        def reset(key):
            keys = jax.random.split(key, self.num_envs)
            state = jax.vmap(reset_env)(keys)
            obs = cast_obs(jax.vmap(partial(step_mod.observe_one, cfg))(state))
            return state, obs

        @jax.jit
        def reset_state(key):
            # Obs-free reset: at config-E scale the initial obs tensor's
            # tile padding alone is ~16 GB ([B, N, 11, 138] bf16 pads
            # 2.7x and [B, N, 3, 11, 11] f32 pads 16.9x — minor dims of
            # 11 on T(8,128) tiles), OOMing a single chip even though the
            # obs-free step path fits. Consumers that never read obs
            # (bench scans, the fused learner) reset through this.
            keys = jax.random.split(key, self.num_envs)
            return jax.vmap(reset_env)(keys)

        @jax.jit
        def step(state, actions):
            new_state, res = jax.vmap(partial(step_mod.step_one, cfg))(state, actions)
            res = res.replace(observations=cast_obs(res.observations))
            done = jax.vmap(partial(step_mod.episode_done, cfg))(new_state)
            metrics = jax.vmap(partial(metrics_mod.episode_metrics, cfg))(new_state)
            return new_state, res, done, metrics

        self._reset = reset
        self._reset_state = reset_state
        self._step = step
        self._step_auto = jax.jit(self._make_step_auto())

    # -- plain (no auto-reset) ------------------------------------------

    def make_key(self, seed: int):
        """PRNG key on this core's dispatch device (host for tiny
        workloads — see the ``device`` policy)."""
        if self._host_device is not None:
            with jax.default_device(self._host_device):
                return jax.random.key(seed)
        return jax.random.key(seed)

    def reset(self, key, with_obs: bool = True):
        """(state, observations) for B envs. key: single PRNG key.

        ``with_obs=False`` returns (state, None) and never materializes
        the [B, N, C, W, W] obs tensor — at config-E scale its tile
        padding alone exceeds single-chip HBM while the obs-free step
        path fits comfortably.

        Raises ValueError if on-device placement failed for any env (the
        bounded retry exhausted — unplaceable config); the reference raises
        on unplaceable configs too."""
        if isinstance(key, int):
            if self._host_device is not None:
                with jax.default_device(self._host_device):
                    key = jax.random.key(key)
            else:
                key = jax.random.key(key)
        if self._host_device is not None:
            # Commit the key to the host device: jit follows committed
            # inputs, so the whole env program (and every later step on
            # the returned state) runs on host XLA — no accelerator
            # round-trips for latency-bound tiny workloads.
            key = jax.device_put(key, self._host_device)
        if with_obs:
            state, obs = self._reset(key)
        else:
            state, obs = self._reset_state(key), None
        if not bool(jnp.all(state.placement_ok)):
            n_bad = int(jnp.sum(~state.placement_ok))
            raise ValueError(
                f"agent/target placement failed for {n_bad}/{self.num_envs} "
                f"env(s) after bounded retries: the map cannot fit "
                f"{self.cfg.num_agents} agents with mutually-reachable "
                f"targets (need >=2 free cells per agent in shared "
                f"components)"
            )
        return state, obs

    def _as_actions(self, actions):
        if isinstance(actions, jax.Array):
            return actions
        if self._host_device is not None:
            # Place host-side actions directly on the dispatch device —
            # jnp.asarray would land them on the default (accelerator)
            # backend and force a cross-device transfer every step.
            return jax.device_put(np.asarray(actions, np.int32), self._host_device)
        return jnp.asarray(actions)

    def step(self, state, actions):
        """No auto-reset: finished envs keep returning their final state.
        Returns (state, StepResult, done bool[B], metrics dict of f32[B])."""
        return self._step(state, self._as_actions(actions))

    # -- auto-reset ------------------------------------------------------

    def _make_step_auto(self, with_obs: bool = True):
        """with_obs=False skips observation assembly entirely (returns
        None in the obs slot) — the state-based learner path reads the
        grid through the policy's fused first layer instead, so building
        the obs tensor would be pure dead weight."""
        cfg = self.cfg
        reset_env = self._reset_env
        mode = self.auto_reset_mode

        def select_done(done, fresh, current):
            def sel(a, b):
                d = done.reshape(done.shape + (1,) * (a.ndim - 1))
                return jnp.where(d, a, b)

            return jax.tree.map(sel, fresh, current)

        def step_auto(state, initial_state, actions):
            new_state, res = jax.vmap(partial(step_mod.step_one, cfg))(state, actions)
            done = jax.vmap(partial(step_mod.episode_done, cfg))(new_state)
            metrics = jax.vmap(partial(metrics_mod.episode_metrics, cfg))(new_state)

            if mode == "cached":
                # Restore cached initial state but advance the per-env key
                # so successive episodes differ where RNG is consumed.
                fresh = initial_state.replace(key=jax.vmap(_advance_key)(new_state.key))
                # Leaves step_one never writes in this mode equal their
                # reset-time values on both sides of the select (cached
                # mode's contract: ``initial_state`` is the object reset
                # returned), so selecting them would copy grid-sized
                # tensors every step for nothing: obstacles is [B, P, P]
                # (~22 MB at config C, ~10% of the step), the respawn
                # queue [B, N, Q], targets_xy [B, N, 2] (static outside
                # LifeLong).
                invariant = {"obstacles", "obstacle_nibbles", "placement_ok"}
                invariant.add(
                    "target_queue" if cfg.on_target == "restart" else "targets_xy"
                )
                keep = {
                    f: getattr(new_state, f)
                    for f in invariant
                    if getattr(new_state, f) is not None
                }
                nones = {f: None for f in keep}
                reset_state = select_done(
                    done,
                    fresh.replace(**nones),
                    new_state.replace(**nones),
                ).replace(**keep)
            else:  # 'regen'

                def regen(ns):
                    keys = jax.vmap(_advance_key)(ns.key)
                    fresh = jax.vmap(reset_env)(keys)
                    # A failed mid-training regeneration (bounded placement
                    # retries exhausted, placement_ok=False) must not leak
                    # garbage into training the way reset()'s loud host
                    # check catches at t=0: fall back to that env's
                    # validated reset-time state (key still advanced, so
                    # the next episode re-rolls a different map).
                    fallback = initial_state.replace(key=keys)
                    fresh = select_done(fresh.placement_ok, fresh, fallback)
                    return select_done(done, fresh, ns)

                reset_state = jax.lax.cond(
                    jnp.any(done), regen, lambda ns: ns, new_state
                )
            if not with_obs:
                return reset_state, None, res.replace(observations=None), done, metrics
            obs = self._cast_obs(
                jax.vmap(partial(step_mod.observe_one, cfg))(reset_state)
            )
            return reset_state, obs, res, done, metrics

        return step_auto

    def step_autoreset(self, state, initial_state, actions):
        """Auto-resetting step. ``initial_state`` MUST be the unmodified
        pytree returned by :meth:`reset` (pass the same object each
        call): 'cached' mode restores finished envs from it, and as an
        optimization the episode-invariant leaves (obstacles,
        placement_ok, and target_queue/targets_xy) are taken from the
        RUNNING state rather than selected — correct exactly because
        step never writes them and ``initial_state`` is reset's output;
        a hand-modified ``initial_state`` would see those leaves
        silently ignored. For custom curriculum resets, call
        :meth:`reset` and swap states on the host instead. Returns
        (state, obs_after_reset, StepResult, done, metrics). StepResult
        holds the PRE-reset rewards/flags/obs of this step;
        ``obs_after_reset`` is what a learner should see next."""
        return self._step_auto(state, initial_state, self._as_actions(actions))


def _advance_key(key):
    return jax.random.split(key, 1)[0]
