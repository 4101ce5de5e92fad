"""Decompose fused-learner time: env-only scan vs rollout (policy in the
loop) vs full PPO train step, same shapes as examples/train_ppo.py.

Prints one JSON line per stage (env-steps/s, best of 3 with forced scalar
fetch — the tunneled backend's block_until_ready does not synchronize).

Usage: python benchmarks/learner_profile.py [--envs 1024 --agents 8]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].sum())
        dt = min(dt, time.perf_counter() - t0)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--agents", type=int, default=8)
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--rollout-steps", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--minibatches", type=int, default=4)
    ap.add_argument("--embed", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=256)
    args = ap.parse_args()

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.models import init_embed_params
    from pogema_tpu.parallel import (
        PPOConfig, init_fused_train_state, make_fused_train_step,
    )
    from pogema_tpu.parallel.rollout import make_state_rollout_fn

    cfg = GridConfig(seed=0, size=args.size, num_agents=args.agents,
                     obs_radius=5, max_episode_steps=128, on_target="restart")
    core = PogemaCore(cfg, num_envs=args.envs, auto_reset_mode="regen")
    model, params = init_embed_params(jax.random.key(0), 11,
                                      embed=args.embed, hidden=args.hidden)
    ppo = PPOConfig(rollout_steps=args.rollout_steps, epochs=args.epochs,
                    minibatches=args.minibatches)
    ts, tx = init_fused_train_state(core, model, params, ppo, jax.random.key(1))
    T, B = args.rollout_steps, args.envs
    denom = T * B

    # 1. env-only scan (no policy, random actions)
    step_auto = core._make_step_auto(with_obs=False)

    @jax.jit
    def env_only(state, initial_state, key):
        def one(carry, _):
            s, k = carry
            k, kk = jax.random.split(k)
            a = jax.random.randint(kk, (B, args.agents), 0, 5, dtype=jnp.int32)
            ns, _, res, _, _ = step_auto(s, initial_state, a)
            return (ns, k), res.rewards.sum()

        (s, _), r = lax.scan(one, (state, key), None, length=T)
        return s.agents_xy.sum() + r.sum()

    dt = timeit(env_only, ts.env_state, ts.initial_env_state, jax.random.key(2))
    print(json.dumps({"stage": "env_only", "env_steps_per_s": round(denom / dt),
                      "ms": round(dt * 1e3, 2)}), flush=True)

    # 2. rollout with policy in the loop
    def apply_state(params, grids, axy, txy, active):
        return model.apply(params, grids, axy, txy, active,
                           method=type(model).from_state)

    rollout = jax.jit(make_state_rollout_fn(core, apply_state, T))
    dt = timeit(lambda: rollout(ts.params, ts.env_state,
                                ts.initial_env_state, ts.key)[2].rewards)
    print(json.dumps({"stage": "rollout_policy",
                      "env_steps_per_s": round(denom / dt),
                      "ms": round(dt * 1e3, 2)}), flush=True)

    # 2b. rollout with the precomputed-grid-embedding policy
    def apply_pre(params, e_grid, axy, txy, active):
        return model.apply(params, e_grid, axy, txy, active,
                           method=type(model).from_state_pre)

    def grid_embed(params, grids):
        return model.apply(params, grids, method=type(model).grid_embed)

    rollout_pre = jax.jit(
        make_state_rollout_fn(core, apply_pre, T, make_ctx=grid_embed)
    )
    dt = timeit(lambda: rollout_pre(ts.params, ts.env_state,
                                    ts.initial_env_state, ts.key)[2].rewards)
    print(json.dumps({"stage": "rollout_policy_pre",
                      "env_steps_per_s": round(denom / dt),
                      "ms": round(dt * 1e3, 2)}), flush=True)

    # 3. full train step
    train_step = jax.jit(make_fused_train_step(core, model, ppo, tx))
    dt = timeit(lambda: train_step(ts)[1]["loss"])
    print(json.dumps({"stage": "train_step", "env_steps_per_s": round(denom / dt),
                      "ms": round(dt * 1e3, 2)}), flush=True)

    # 3b. k train steps per dispatch: a single host->device round trip
    # costs a fixed ~31 ms through the tunnel, so per-step timings above
    # overstate the compute; this is the steady-state training rate.
    from pogema_tpu.parallel import make_fused_train_many

    kmany = 4
    train_many = jax.jit(make_fused_train_many(core, model, ppo, tx, kmany))
    dt = timeit(lambda: train_many(ts)[1]["loss"])
    print(json.dumps({"stage": f"train_step_x{kmany}",
                      "env_steps_per_s": round(kmany * denom / dt),
                      "ms_per_train_step": round(dt / kmany * 1e3, 2)}),
          flush=True)

    # 4. decompose the update at the REAL minibatch shapes of the 'pre'
    # path: roll-mix of the [T, B, ...] dataset vs one minibatch grad.
    n_agents = args.agents
    tsub = T // args.minibatches
    dataset = (
        jnp.zeros((T, B, n_agents, 2), jnp.int32),   # agents_xy
        jnp.zeros((T, B, n_agents, 2), jnp.int32),   # targets_xy
        jnp.ones((T, B, n_agents), bool),            # active
        jnp.zeros((T, B, n_agents), jnp.int32),      # actions
        jnp.zeros((T, B, n_agents), jnp.float32),    # log_probs
        jnp.ones((T, B, n_agents), jnp.float32),     # advantages
        jnp.ones((T, B, n_agents), jnp.float32),     # targets
    )

    @jax.jit
    def roll_mix(key, dataset):
        shift = jax.random.randint(key, (), 0, T)
        return jax.tree.map(
            lambda x: jnp.roll(x, shift, axis=0).reshape(
                (tsub, args.minibatches) + x.shape[1:]
            ),
            dataset,
        )

    dt = timeit(roll_mix, jax.random.key(3), dataset)
    print(json.dumps({"stage": "epoch_roll_mix", "ms": round(dt * 1e3, 2),
                      "per_train_step_ms": round(dt * 1e3 * args.epochs, 2)}),
          flush=True)

    grids = ts.env_state.obstacles
    batch = jax.tree.map(lambda x: x[:tsub], dataset)

    def loss_fn(params):
        e_grid = grid_embed(params, grids)
        logits, values = apply_pre(params, e_grid, batch[0], batch[1],
                                   batch[2])
        return jnp.mean(logits) + jnp.mean(values)

    grad = jax.jit(jax.grad(loss_fn))
    dt = timeit(grad, ts.params)
    per_step = dt * args.epochs * args.minibatches
    print(json.dumps({"stage": "grad_minibatch_pre", "ms": round(dt * 1e3, 2),
                      "per_train_step_ms": round(per_step * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
