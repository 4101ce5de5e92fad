"""Compile-once batched evaluation of TRAINED policies — the learned-
policy counterpart of core.planner.make_planner_evaluator.

The toolbox rim evaluates checkpoints one host step at a time (a
policy forward + env step per Python iteration); at eval scale that is
dispatch-bound. Here the whole episode — reset, obs-free policy
forward (EmbedActorCritic.from_state / RecurrentEmbedActorCritic.
step_from_state: the obs tensor never exists), action selection, env
step, per-env freeze at episode end — is ONE jitted lax.scan over B
envs, so ladders/sweeps run at device speed for any batch size.

Works for every on_target mode including LifeLong (unlike the planner
evaluator, a policy needs no precomputed distance fields, so moving
targets are fine).

    core = PogemaCore(cfg, num_envs=1024)
    run = make_policy_evaluator(core, model, params)   # compile once
    state, metrics = run(jax.random.key(seed))          # per seed
    float(metrics["avg_throughput"].mean())
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def make_policy_evaluator(core, model, params, greedy: bool = True):
    """Returns ``run(key) -> (final_state, {metric: f32[B]})``, jitted.

    ``model``/``params``: an EmbedActorCritic or RecurrentEmbedActorCritic
    (auto-detected via ``initial_carry``) with its trained params —
    params are passed as a jit ARGUMENT each call (never closed over:
    closure device arrays embed as constants through a host fetch,
    CLAUDE.md). ``greedy``: argmax actions (evaluation default); False
    samples from the policy (the exploration distribution).

    Reset consumes the caller's key verbatim, so the episode's world
    matches ``core.reset(key)`` / the planner evaluator on the same key
    — ladder rows are comparable per seed. Finished envs are frozen so
    ep_length/ISR/CSR reflect true episode ends."""
    from ..core import metrics as metrics_mod
    from ..core import step as step_mod

    cfg = core.cfg
    mcls = type(model)
    recurrent = hasattr(model, "initial_carry")

    def policy(params, st, h):
        if recurrent:
            h, logits, _ = model.apply(
                params, st.obstacles, st.agents_xy, st.targets_xy,
                st.active, h, method=mcls.step_from_state,
            )
            return h, logits
        logits, _ = model.apply(
            params, st.obstacles, st.agents_xy, st.targets_xy, st.active,
            method=mcls.from_state,
        )
        return h, logits

    @jax.jit
    def run_jit(params, key):
        state, _ = core._reset(key)
        key = jax.random.fold_in(key, 0x9E3779B9)
        h0 = (model.initial_carry((core.num_envs, cfg.num_agents))
              if recurrent else 0)

        def one(carry, _):
            st, h, k = carry
            k, k_act = jax.random.split(k)
            done = jax.vmap(partial(step_mod.episode_done, cfg))(st)
            h, logits = policy(params, st, h)
            if greedy:
                actions = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                actions = jax.random.categorical(k_act, logits).astype(
                    jnp.int32)
            new_state, _ = jax.vmap(partial(step_mod.step_one, cfg))(
                st, actions)

            def sel(new, old):
                d = done.reshape(done.shape + (1,) * (new.ndim - 1))
                return jnp.where(d, old, new)

            return (jax.tree.map(sel, new_state, st), h, k), None

        (state, _, _), _ = lax.scan(
            one, (state, h0, key), None, length=cfg.max_episode_steps
        )
        return state, jax.vmap(partial(metrics_mod.episode_metrics, cfg))(
            state)

    def run(key):
        state, metrics = run_jit(params, key)
        if not bool(jnp.all(state.placement_ok)):
            n_bad = int(jnp.sum(~state.placement_ok))
            raise RuntimeError(
                f"{n_bad}/{core.num_envs} envs failed placement for this "
                "key; metrics over garbage positions would be meaningless"
            )
        return state, metrics

    return run
