"""Sharded PPO learner over the vectorized env (SURVEY.md §2/§7: the
batch-data-parallel MARL learner with gradient psum over the mesh — the
component the reference delegates to external RL frameworks).

One ``train_step`` = rollout T steps (lax.scan, on-device) -> GAE ->
E epochs × M minibatches of clipped-surrogate updates (again lax.scan).
Everything jits into a single XLA program; with EnvState and trajectories
sharded over the mesh 'data' axis and params replicated, XLA turns the
loss/grad means into psums over ICI automatically (scaling-book recipe).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax import lax

from .rollout import (
    Transition,
    make_recurrent_rollout_fn,
    make_rollout_fn,
    make_state_rollout_fn,
)


@flax.struct.dataclass
class PPOConfig:
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    entropy_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    rollout_steps: int = 128
    epochs: int = 2
    minibatches: int = 4
    # Fused-path obstacle-term strategy: 'pre' precomputes the grid
    # embedding as a VALID conv and row-selects it (fast for small/medium
    # maps; needs rollout_steps % minibatches == 0), 'windows' extracts
    # per-agent windows (no constraints, scales to huge maps), 'auto'
    # picks by an f32[B, S, S, E] memory estimate.
    obstacle_path: str = flax.struct.field(pytree_node=False, default="auto")
    # 'pre' minibatch loss: scan the policy over the minibatch's TIME
    # axis under remat instead of evaluating all T_mb steps at once.
    # Escape hatch only — measured SLOWER (53k vs 83k env-steps/s at
    # 1024x64x64^2) and the one-shot loss does NOT materialize the big
    # one-hot transients (XLA tiles the contraction; one-shot ran clean
    # up to 8192 envs / embed 128 on a 16 GB chip). Default off.
    scan_minibatch_time: Optional[bool] = flax.struct.field(
        pytree_node=False, default=False)


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    env_state: Any
    initial_env_state: Any
    obs: jnp.ndarray
    key: jnp.ndarray


def _init_state(core, params, config: PPOConfig, key, with_obs: bool):
    """Shared by both init flavors so the optimizer chain can never
    silently diverge between the obs-based and fused paths."""
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.lr),
    )
    key, k_reset = jax.random.split(key)
    env_state, obs = core.reset(k_reset, with_obs=with_obs)
    return (
        TrainState(
            params=params,
            opt_state=tx.init(params),
            env_state=env_state,
            initial_env_state=env_state,
            obs=obs,
            key=key,
        ),
        tx,
    )


def init_train_state(core, model, params, config: PPOConfig, key) -> tuple:
    """Returns (TrainState, optax optimizer)."""
    return _init_state(core, params, config, key, with_obs=True)


def _epoch_mix(key, n, minibatches):
    """Per-epoch minibatch partition WITHOUT a row gather (``x[perm]``
    over [T*B, ...] serializes on TPU, ~25 ms/epoch at 64x1024).

    Returns mix(x): [n, ...] -> [n // M, M, ...] with minibatch = axis 1.
    A pure random roll is NOT a reshuffle: reshape (mb, M) puts row r in
    minibatch (r + shift) % M, and the *unordered* partition {rows == j
    (mod M)} is the same residue-class family for every shift. Instead
    the roll is composed with a granularity-g block interleave —
    reshape (n/(M*g), M, g), swap, flatten — which places row r in
    minibatch (r // g) % M. Across epochs g is drawn from the powers of
    two dividing mb and the shift re-blocks rows within each family
    (for g > 1 a translation changes which rows share a g-block), so
    minibatch composition genuinely varies. All branches are reshapes /
    relayouts under one lax.switch — no gathers."""
    mb = n // minibatches
    gs = [g for g in (1, 2, 4, 8, 16, 32, 64, 128) if mb % g == 0]
    k_shift, k_g = jax.random.split(key)
    shift = jax.random.randint(k_shift, (), 0, n)
    g_idx = jax.random.randint(k_g, (), 0, len(gs))

    def mk(g):
        def f(x):
            x = jnp.roll(x, shift, axis=0)
            x = x.reshape((n // (minibatches * g), minibatches, g) + x.shape[1:])
            x = jnp.swapaxes(x, 1, 2)
            return x.reshape((mb, minibatches) + x.shape[3:])

        return f

    branches = [mk(g) for g in gs]
    return lambda x: lax.switch(g_idx, branches, x)


def _check_minibatch_divisibility(n, minibatches, what):
    if n % minibatches:
        raise ValueError(
            f"{what} ({n}) must be divisible by minibatches "
            f"({minibatches}); adjust rollout_steps/num_envs/minibatches"
        )


def compute_gae(traj: Transition, last_values, gamma, lam):
    """Per-agent GAE over the time axis; resets at per-agent dones."""

    def one(carry, step):
        gae, next_value = carry
        value, reward, done = step
        not_done = 1.0 - done.astype(jnp.float32)
        delta = reward + gamma * next_value * not_done - value
        gae = delta + gamma * lam * not_done * gae
        return (gae, value), gae

    (_, _), advantages = lax.scan(
        one,
        (jnp.zeros_like(last_values), last_values),
        (traj.values, traj.rewards, traj.dones),
        reverse=True,
    )
    return advantages, advantages + traj.values


def init_fused_train_state(core, model, params, config: PPOConfig, key):
    """TrainState for the fused (obs-free) path: same as
    :func:`init_train_state` but no observation tensor is ever held."""
    return _init_state(core, params, config, key, with_obs=False)


def _check_static_maps(core, config: PPOConfig):
    """The fused update recomputes embeddings from per-ENV grids captured
    once per rollout, which is only sound when no env's map can change
    mid-rollout: 'cached' auto-reset never regenerates maps, and 'regen'
    is safe exactly when episodes end only at the time limit ('restart')
    on rollout boundaries (rollout_steps divides max_episode_steps; all
    envs step in lockstep from step_count 0, so the time limit always
    lands on a rollout boundary then)."""
    if core.auto_reset_mode == "cached":
        return
    gc = core.grid_config
    if (
        gc.on_target == "restart"
        and gc.max_episode_steps % config.rollout_steps == 0
    ):
        return
    raise ValueError(
        "fused train step needs static per-rollout maps: use "
        "auto_reset_mode='cached', or 'regen' with on_target='restart' "
        "and rollout_steps dividing max_episode_steps "
        f"(got mode={core.auto_reset_mode!r}, on_target={gc.on_target!r}, "
        f"max_episode_steps={gc.max_episode_steps}, "
        f"rollout_steps={config.rollout_steps}); the obs-based "
        "make_train_step has no such restriction"
    )


def _ppo_element_terms(config: PPOConfig, logits, values, actions,
                       old_log_probs, adv_normalized, targets):
    """Per-element clipped-surrogate terms (no reductions): the shared
    math between the one-shot loss and the time-scanned loss. Returns
    (min(pg1, pg2), squared value error, entropy) elementwise."""
    log_probs_all = jax.nn.log_softmax(logits)
    # One-hot select, not take_along_axis: gathers serialize on TPU.
    act_oh = actions[..., None] == jnp.arange(
        logits.shape[-1], dtype=actions.dtype
    )
    log_probs = jnp.sum(log_probs_all * act_oh, axis=-1)
    ratio = jnp.exp(log_probs - old_log_probs)
    pg1 = ratio * adv_normalized
    pg2 = jnp.clip(ratio, 1.0 - config.clip_eps,
                   1.0 + config.clip_eps) * adv_normalized
    pg_el = jnp.minimum(pg1, pg2)
    v_el = (values - targets) ** 2
    ent_el = -jnp.sum(jax.nn.softmax(logits) * log_probs_all, axis=-1)
    return pg_el, v_el, ent_el


def _normalize_adv(advantages):
    return (advantages - advantages.mean()) / (advantages.std() + 1e-8)


def _ppo_total(config: PPOConfig, pg_loss, v_loss, entropy):
    total = pg_loss + config.vf_coef * v_loss - config.entropy_coef * entropy
    return total, (pg_loss, v_loss, entropy)


def _ppo_loss_terms(config: PPOConfig, logits, values, actions,
                    old_log_probs, advantages, targets):
    """Clipped-surrogate PPO loss from policy outputs; shared by every
    train-step flavor."""
    adv = _normalize_adv(advantages)
    pg_el, v_el, ent_el = _ppo_element_terms(
        config, logits, values, actions, old_log_probs, adv, targets
    )
    return _ppo_total(config, -pg_el.mean(), 0.5 * v_el.mean(),
                      ent_el.mean())


def _train_stats(stats, traj):
    loss, pg, vl, ent = (s.mean() for s in stats)
    out = {
        "loss": loss,
        "pg_loss": pg,
        "v_loss": vl,
        "entropy": ent,
        "reward_per_step": traj.rewards.mean(),
    }
    # Episode metrics averaged over the episodes that ENDED during the
    # rollout (the mask is traj.env_dones); NaN-free when none ended.
    done_f = traj.env_dones.astype(jnp.float32)
    denom = jnp.maximum(done_f.sum(), 1.0)
    for k, v in traj.metrics.items():
        out[f"episode_{k}"] = (v * done_f).sum() / denom
    out["episodes_finished"] = done_f.sum()
    return out


def make_fused_train_step(core, model, config: PPOConfig, tx):
    """PPO train step on the fused, obs-free path (VERDICT r1 item 1).

    vs :func:`make_train_step`: the rollout stores compact state instead
    of observations (~360x less trajectory HBM), and the update
    recomputes the policy input from state + the per-env static grids —
    the obs tensor and its ~12x tile padding never exist.

    Two obstacle-term strategies (``config.obstacle_path``):

    * 'pre' — the grid embedding is precomputed as ONE VALID conv
      (EmbedActorCritic.grid_embed: MXU-friendly K = w*w im2col) per
      rollout / per minibatch loss, and per-agent reads become one-hot
      row selects with contraction depth Sr*Sc. Minibatches slice the
      TIME axis (all B envs present in each), so grids stay aligned with
      the env axis — no per-row grid selection at all, and the 'data'
      sharding of B survives every reshape. Needs
      rollout_steps % minibatches == 0.
    * 'windows' — per-agent window extraction (ops/windows.py) with
      env-step-granularity minibatches; per-minibatch grids selected by
      a one-hot matmul (TPU gathers serialize). No constraints; the
      e_grid tensor never exists, so it scales to huge maps.
    """
    _check_static_maps(core, config)
    mcls = type(model)

    def apply_state(params, grids, axy, txy, active):
        return model.apply(params, grids, axy, txy, active,
                           method=mcls.from_state)

    def apply_pre(params, e_grid, axy, txy, active):
        return model.apply(params, e_grid, axy, txy, active,
                           method=mcls.from_state_pre)

    def grid_embed(params, grids):
        return model.apply(params, grids, method=mcls.grid_embed)

    time_mb = config.rollout_steps % config.minibatches == 0
    if config.obstacle_path == "pre":
        if not time_mb:
            raise ValueError(
                "obstacle_path='pre' needs rollout_steps divisible by "
                f"minibatches (got {config.rollout_steps} % "
                f"{config.minibatches})"
            )
        use_pre = True
    elif config.obstacle_path == "windows":
        use_pre = False
    elif config.obstacle_path == "auto":
        # Measured rule (benchmarks/pre4096_probe.py, v5e, round 3):
        # 'pre' reads S*S embedding rows per agent per policy eval, so
        # its cost grows with map AREA; 'windows' extracts w*w cells.
        # Crossover sits between S=16 (pre 1.15M vs windows 0.80M
        # env-steps/s at 1024x8) and S=64 (windows wins every measured
        # combo: 104k vs 83k at 1024x64, 90k vs 66k at 4096x64, 321k vs
        # 162k at 1024x8) -> use 'pre' for S^2 <= 8*w^2 (S <= 31 at
        # r=5). Memory is NOT the gate it was believed to be in round 2:
        # XLA tiles the one-hot contractions (nothing OOMed up to
        # 8192 envs / embed 128 one-shot), so the bf16 e_grid estimate
        # only guards true monsters.
        s_est = core.cfg.size
        w_est = core.cfg.window
        pre_bytes = 2 * core.num_envs * s_est * s_est * model.embed
        use_pre = (time_mb and s_est * s_est <= 8 * w_est * w_est
                   and pre_bytes <= 6_000_000_000)
    else:
        raise ValueError(
            f"unknown obstacle_path {config.obstacle_path!r} "
            "(expected 'auto', 'pre' or 'windows')"
        )

    if use_pre:
        return _make_fused_pre_train_step(
            core, config, tx, apply_pre, grid_embed
        )

    rollout = make_state_rollout_fn(core, apply_state, config.rollout_steps)

    def loss_fn(params, grids_mb, batch):
        axy, txy, active, actions, old_log_probs, advantages, targets = batch
        logits, values = apply_state(params, grids_mb, axy, txy, active)
        return _ppo_loss_terms(config, logits, values, actions,
                               old_log_probs, advantages, targets)

    def train_step(ts: TrainState):
        # Valid for every transition of this rollout (static-map check).
        grids = ts.env_state.obstacles
        b = grids.shape[0]
        p = grids.shape[-1]
        grids_flat = grids.astype(jnp.bfloat16).reshape(b, p * p)

        env_state, key, traj = rollout(
            ts.params, ts.env_state, ts.initial_env_state, ts.key
        )
        _, last_values = apply_state(
            ts.params, env_state.obstacles, env_state.agents_xy,
            env_state.targets_xy, env_state.active,
        )
        advantages, targets = compute_gae(
            traj, last_values, config.gamma, config.gae_lambda
        )

        # Flatten (T, B, ...) -> (T*B, ...) keeping the agent axis: the
        # dataset rows are env-steps, so sample s's env is s % B.
        t_steps = traj.actions.shape[0]

        def flat(x):
            return x.reshape((t_steps * b,) + x.shape[2:])

        dataset = (
            flat(traj.agents_xy),
            flat(traj.targets_xy),
            flat(traj.active),
            flat(traj.actions),
            flat(traj.log_probs),
            flat(advantages),
            flat(targets),
        )
        env_ids = jnp.tile(jnp.arange(b, dtype=jnp.int32), t_steps)
        n = t_steps * b
        _check_minibatch_divisibility(n, config.minibatches,
                                      "rollout rows T*B")
        mb = n // config.minibatches
        iota_b = jnp.arange(b, dtype=jnp.int32)

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k_mix = jax.random.split(key)
            mix = _epoch_mix(k_mix, n, config.minibatches)
            shuffled = jax.tree.map(mix, dataset)
            ids_shuffled = mix(env_ids)

            def minibatch(carry, i):
                params, opt_state = carry
                batch = jax.tree.map(
                    lambda x: lax.dynamic_slice_in_dim(x, i, 1, axis=1)[:, 0],
                    shuffled,
                )
                ids = lax.dynamic_slice_in_dim(ids_shuffled, i, 1, axis=1)[:, 0]
                # One-hot matmul grid selection (TPU gathers serialize).
                onehot = (ids[:, None] == iota_b[None, :]).astype(jnp.bfloat16)
                grids_mb = (onehot @ grids_flat).reshape(mb, p, p)
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, grids_mb, batch
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, *aux)

            (params, opt_state), stats = lax.scan(
                minibatch, (params, opt_state), jnp.arange(config.minibatches)
            )
            return (params, opt_state, key), stats

        (params, opt_state, key), stats = lax.scan(
            epoch, (ts.params, ts.opt_state, key), None, length=config.epochs
        )
        new_ts = ts.replace(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            key=key,
        )
        return new_ts, _train_stats(stats, traj)

    return train_step


def _make_fused_pre_train_step(core, config: PPOConfig, tx, apply_pre,
                               grid_embed):
    """The 'pre' flavor of :func:`make_fused_train_step` (see there)."""
    rollout = make_state_rollout_fn(
        core, apply_pre, config.rollout_steps, make_ctx=grid_embed
    )

    def loss_fn(params, grids, batch):
        axy, txy, active, actions, old_log_probs, advantages, targets = batch
        # Recomputed per minibatch so the gradient w.r.t. the obstacle
        # kernel flows through the conv (one cheap VALID conv over the B
        # static grids — NOT per row).
        e_grid = grid_embed(params, grids)
        logits, values = apply_pre(params, e_grid, axy, txy, active)
        return _ppo_loss_terms(config, logits, values, actions,
                               old_log_probs, advantages, targets)

    def loss_fn_scan_t(params, grids, batch):
        """Same loss, policy evaluated one TIME step at a time under
        lax.scan + remat: the from_state_pre one-hot transients scale
        with T_mb*B*N*S^2 when all minibatch steps are evaluated at
        once — at 4096 envs x 64x64 maps that alone exceeds HBM
        (VERDICT r2 item 2); scanning caps them at one step's worth and
        remat recomputes the cheap elementwise one-hots in the backward
        pass instead of saving T_mb copies. Identical math up to
        reduction order (test-gated: tests/test_fused.py)."""
        axy, txy, active, actions, old_log_probs, advantages, targets = batch
        e_grid = grid_embed(params, grids)
        adv_n = _normalize_adv(advantages)  # global over the minibatch

        @jax.checkpoint
        def one_t(carry, xs):
            axy_t, txy_t, act_t, actions_t, old_t, advn_t, tgt_t = xs
            logits, values = apply_pre(params, e_grid, axy_t, txy_t, act_t)
            pg_el, v_el, ent_el = _ppo_element_terms(
                config, logits, values, actions_t, old_t, advn_t, tgt_t
            )
            pg, v, ent = carry
            return (pg + pg_el.sum(), v + v_el.sum(), ent + ent_el.sum()), None

        zero = jnp.zeros((), jnp.float32)
        (pg_sum, v_sum, ent_sum), _ = lax.scan(
            one_t, (zero, zero, zero),
            (axy, txy, active, actions, old_log_probs, adv_n, targets),
        )
        count = jnp.float32(actions.shape[0] * actions.shape[1]
                            * actions.shape[2])
        return _ppo_total(config, -pg_sum / count, 0.5 * v_sum / count,
                          ent_sum / count)

    # Default OFF: the feared T_mb*B*N*S^2 one-hot transients are NOT
    # materialized by XLA (it tiles the contraction — one-shot ran clean
    # up to 8192 envs / embed 128 on a 16 GB v5e), and the scan is
    # measured slower (1024x64x64^2: 53k vs 83k env-steps/s). Kept as an
    # explicit escape hatch for shapes beyond anything measured.
    if config.scan_minibatch_time:
        loss_fn = loss_fn_scan_t

    def train_step(ts: TrainState):
        # Valid for every transition of this rollout (static-map check).
        grids = ts.env_state.obstacles

        env_state, key, traj = rollout(
            ts.params, ts.env_state, ts.initial_env_state, ts.key
        )
        # Bootstrap values come from the post-rollout state, whose maps
        # may already be regenerated ('regen' auto-reset fires exactly on
        # the rollout boundary) — embed ITS grids, not the rollout's.
        _, last_values = apply_pre(
            ts.params, grid_embed(ts.params, env_state.obstacles),
            env_state.agents_xy, env_state.targets_xy, env_state.active,
        )
        advantages, targets = compute_gae(
            traj, last_values, config.gamma, config.gae_lambda
        )

        # Dataset stays [T, B, ...]: minibatches are interleaved slices
        # of the TIME axis (every env in every minibatch), remixed per
        # epoch (_epoch_mix) — no row gathers, no grid re-selection, and
        # the 'data' sharding of B is never reshaped away.
        t_steps = traj.actions.shape[0]
        _check_minibatch_divisibility(t_steps, config.minibatches,
                                      "rollout_steps")
        dataset = (
            traj.agents_xy,
            traj.targets_xy,
            traj.active,
            traj.actions,
            traj.log_probs,
            advantages,
            targets,
        )

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k_mix = jax.random.split(key)
            mix = _epoch_mix(k_mix, t_steps, config.minibatches)
            shuffled = jax.tree.map(mix, dataset)

            def minibatch(carry, i):
                params, opt_state = carry
                batch = jax.tree.map(
                    lambda x: lax.dynamic_slice_in_dim(x, i, 1, axis=1)[:, 0],
                    shuffled,
                )
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, grids, batch
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, *aux)

            (params, opt_state), stats = lax.scan(
                minibatch, (params, opt_state), jnp.arange(config.minibatches)
            )
            return (params, opt_state, key), stats

        (params, opt_state, key), stats = lax.scan(
            epoch, (ts.params, ts.opt_state, key), None, length=config.epochs
        )
        new_ts = ts.replace(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            key=key,
        )
        return new_ts, _train_stats(stats, traj)

    return train_step


def make_fused_train_many(core, model, config: PPOConfig, tx, steps: int):
    """``steps`` fused train steps as ONE jitted program
    (``lax.scan`` over :func:`make_fused_train_step`'s raw step — never
    a nested jit, which would be opaque to XLA inside the scan).

    Why: every host dispatch through the tunneled TPU costs a fixed
    ~31 ms — at the 1024x8 profile shape a single 90 ms-measured train
    step is really ~59 ms of compute, so batching k steps per dispatch
    recovers ~35% wall-clock (benchmarks/learner_profile.py
    'train_step_x4'). The TrainState trajectory is bit-identical to k
    sequential calls; stats are averaged over the k steps
    (``episodes_finished`` is summed).

    Returns train_many(ts) -> (ts, stats).
    """
    step = make_fused_train_step(core, model, config, tx)

    def train_many(ts: TrainState):
        def one(ts, _):
            return step(ts)

        ts, stats = lax.scan(one, ts, None, length=steps)
        out = {k: v.mean() for k, v in stats.items()}
        out["episodes_finished"] = stats["episodes_finished"].sum()
        return ts, out

    return train_many


@flax.struct.dataclass
class RecurrentTrainState:
    params: Any
    opt_state: Any
    env_state: Any
    initial_env_state: Any
    h: jnp.ndarray  # GRU hidden dtype[B, N, H], carried across rollouts
    key: jnp.ndarray


def init_recurrent_train_state(core, model, params, config: PPOConfig,
                               key) -> tuple:
    """(RecurrentTrainState, optax optimizer) for the GRU family."""
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.lr),
    )
    key, k_reset = jax.random.split(key)
    env_state, _ = core.reset(k_reset, with_obs=False)
    h = model.initial_carry((core.num_envs, core.cfg.num_agents))
    return (
        RecurrentTrainState(
            params=params,
            opt_state=tx.init(params),
            env_state=env_state,
            initial_env_state=env_state,
            h=h,
            key=key,
        ),
        tx,
    )


def make_recurrent_train_step(core, model, config: PPOConfig, tx):
    """PPO for the recurrent (GRU) family — the memoryful model under
    partial observability (models/recurrent.py).

    Rollout: obs-free, hidden state in the scan carry, zeroed at agent
    dones (make_recurrent_rollout_fn). Update: minibatches slice the ENV
    axis (sequences stay whole), and each loss replays the full
    rollout-length sequence from the stored pre-rollout hidden state —
    the stored per-step dones reproduce the exact hidden-state evolution
    the rollout saw, so at epoch 0 the replayed log-probs equal the
    rollout's (test-gated, tests/test_recurrent.py). Needs
    num_envs % minibatches == 0."""
    _check_static_maps(core, config)
    mcls = type(model)

    def apply_cell(params, grids, axy, txy, active, h):
        return model.apply(params, grids, axy, txy, active, h,
                           method=mcls.step_from_state)

    rollout = make_recurrent_rollout_fn(core, apply_cell,
                                        config.rollout_steps)
    _check_minibatch_divisibility(core.num_envs, config.minibatches,
                                  "num_envs (recurrent minibatches "
                                  "slice the env axis)")

    def loss_fn(params, grids_mb, h0_mb, batch):
        # batch fields: [mb, T, ...] (env-major so the epoch mix works on
        # axis 0); the replay scans time, so move T in front.
        batch = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), batch)
        (axy, txy, active, actions, old_log_probs, advantages, targets,
         dones) = batch

        def cell(h, xs):
            a, t, act, d = xs
            new_h, logits, values = apply_cell(
                params, grids_mb, a, t, act, h
            )
            new_h = jnp.where(d[..., None], 0, new_h)
            return new_h, (logits, values)

        _, (logits, values) = lax.scan(
            cell, h0_mb, (axy, txy, active, dones)
        )
        return _ppo_loss_terms(config, logits, values, actions,
                               old_log_probs, advantages, targets)

    def train_step(ts: RecurrentTrainState):
        # Valid for every transition of this rollout (static-map check).
        grids = ts.env_state.obstacles
        h0 = ts.h

        env_state, h_last, key, traj = rollout(
            ts.params, ts.env_state, ts.initial_env_state, ts.h, ts.key
        )
        _, _, last_values = apply_cell(
            ts.params, env_state.obstacles, env_state.agents_xy,
            env_state.targets_xy, env_state.active, h_last,
        )
        advantages, targets = compute_gae(
            traj, last_values, config.gamma, config.gae_lambda
        )

        # Env-major dataset [B, T, ...]: the epoch mix partitions envs.
        def env_major(x):
            return jnp.swapaxes(x, 0, 1)

        dataset = jax.tree.map(env_major, (
            traj.agents_xy,
            traj.targets_xy,
            traj.active,
            traj.actions,
            traj.log_probs,
            advantages,
            targets,
            traj.dones,
        ))
        b = core.num_envs

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k_mix = jax.random.split(key)
            mix = _epoch_mix(k_mix, b, config.minibatches)
            shuffled = jax.tree.map(mix, dataset)
            grids_s = mix(grids.astype(jnp.bfloat16))
            h0_s = mix(h0)

            def minibatch(carry, i):
                params, opt_state = carry
                take = lambda x: lax.dynamic_slice_in_dim(
                    x, i, 1, axis=1)[:, 0]
                batch = jax.tree.map(take, shuffled)
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, take(grids_s), take(h0_s), batch)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, *aux)

            (params, opt_state), stats = lax.scan(
                minibatch, (params, opt_state),
                jnp.arange(config.minibatches)
            )
            return (params, opt_state, key), stats

        (params, opt_state, key), stats = lax.scan(
            epoch, (ts.params, ts.opt_state, key), None,
            length=config.epochs
        )
        new_ts = ts.replace(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            h=h_last,
            key=key,
        )
        return new_ts, _train_stats(stats, traj)

    return train_step


def make_recurrent_train_many(core, model, config: PPOConfig, tx,
                              steps: int):
    """``steps`` recurrent train steps as ONE jitted program — the
    recurrent counterpart of :func:`make_fused_train_many` (same
    rationale: each host dispatch through the tunneled TPU costs a fixed
    ~31 ms). Returns train_many(RecurrentTrainState) -> (ts, stats)."""
    step = make_recurrent_train_step(core, model, config, tx)

    def train_many(ts: RecurrentTrainState):
        def one(ts, _):
            return step(ts)

        ts, stats = lax.scan(one, ts, None, length=steps)
        out = {k: v.mean() for k, v in stats.items()}
        out["episodes_finished"] = stats["episodes_finished"].sum()
        return ts, out

    return train_many


def make_train_step(core, model, config: PPOConfig, tx):
    """Returns jit-able train_step(TrainState) -> (TrainState, stats)."""
    apply_fn = model.apply
    rollout = make_rollout_fn(core, apply_fn, config.rollout_steps)

    def loss_fn(params, batch):
        obs, actions, old_log_probs, advantages, targets = batch
        logits, values = apply_fn(params, obs)
        return _ppo_loss_terms(config, logits, values, actions,
                               old_log_probs, advantages, targets)

    def train_step(ts: TrainState):
        env_state, obs, key, traj = rollout(
            ts.params, ts.env_state, ts.initial_env_state, ts.obs, ts.key
        )
        _, last_values = apply_fn(ts.params, obs)
        advantages, targets = compute_gae(
            traj, last_values, config.gamma, config.gae_lambda
        )

        # Flatten (T, B, N, ...) -> (T*B*N, ...); keep it simple and let
        # the 'data' sharding of B propagate through the reshape.
        def flat(x):
            return x.reshape((-1,) + x.shape[3:])

        dataset = (
            flat(traj.obs),
            flat(traj.actions),
            flat(traj.log_probs),
            flat(advantages),
            flat(targets),
        )
        n = dataset[1].shape[0]
        _check_minibatch_divisibility(n, config.minibatches,
                                      "rollout rows T*B*N")
        mb = n // config.minibatches

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k_mix = jax.random.split(key)
            # Interleave-mix, not a row-permutation gather (see
            # _epoch_mix for the rationale).
            mix = _epoch_mix(k_mix, n, config.minibatches)
            shuffled = jax.tree.map(mix, dataset)

            def minibatch(carry, i):
                params, opt_state = carry
                batch = jax.tree.map(
                    lambda x: lax.dynamic_slice_in_dim(x, i, 1, axis=1)[:, 0],
                    shuffled,
                )
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, *aux)

            (params, opt_state), stats = lax.scan(
                minibatch, (params, opt_state), jnp.arange(config.minibatches)
            )
            return (params, opt_state, key), stats

        (params, opt_state, key), stats = lax.scan(
            epoch, (ts.params, ts.opt_state, key), None, length=config.epochs
        )
        new_ts = ts.replace(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            obs=obs,
            key=key,
        )
        return new_ts, _train_stats(stats, traj)

    return train_step
