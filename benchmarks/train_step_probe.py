"""One-off probes of fused-train-step variants on the real chip: rollout
scan unroll and epoch roll-vs-static minibatch partition. Results land in
benchmarks/RESULTS.md; keep this for re-measuring after XLA upgrades.

Usage: python benchmarks/train_step_probe.py [--envs 1024 --agents 8]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

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
    args = ap.parse_args()

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.models import init_embed_params
    from pogema_tpu.parallel import (
        PPOConfig, init_fused_train_state, make_fused_train_step,
    )
    from pogema_tpu.parallel import rollout as rollout_mod
    from pogema_tpu.parallel.rollout import make_state_rollout_fn

    cfg = GridConfig(seed=0, size=args.size, num_agents=args.agents,
                     obs_radius=5, max_episode_steps=128, on_target="restart")
    core = PogemaCore(cfg, num_envs=args.envs, auto_reset_mode="regen")
    model, params = init_embed_params(jax.random.key(0), 11)
    T, B = args.rollout_steps, args.envs
    denom = T * B

    def apply_pre(params, e_grid, axy, txy, active):
        return model.apply(params, e_grid, axy, txy, active,
                           method=type(model).from_state_pre)

    def grid_embed(params, grids):
        return model.apply(params, grids, method=type(model).grid_embed)

    ppo = PPOConfig(rollout_steps=T, epochs=2, minibatches=4)
    ts, tx = init_fused_train_state(core, model, params, ppo, jax.random.key(1))

    # A. rollout unroll sweep (pre policy)
    for unroll in (1, 2, 4):
        ro = jax.jit(make_state_rollout_fn(core, apply_pre, T,
                                           make_ctx=grid_embed, unroll=unroll))
        dt = timeit(lambda: ro(ts.params, ts.env_state,
                               ts.initial_env_state, ts.key)[2].rewards)
        print(json.dumps({"probe": f"rollout_pre_unroll{unroll}",
                          "ms": round(dt * 1e3, 2),
                          "env_steps_per_s": round(denom / dt)}), flush=True)

    # B. full train step, roll-mix vs static partition (monkeypatched)
    for variant in ("roll", "static"):
        if variant == "static":
            orig = jnp.roll
            jnp.roll = lambda x, shift, axis=0: x  # noqa: E731
        try:
            step = jax.jit(make_fused_train_step(core, model, ppo, tx))
            dt = timeit(lambda: step(ts)[1]["loss"])
        finally:
            if variant == "static":
                jnp.roll = orig
        print(json.dumps({"probe": f"train_step_{variant}",
                          "ms": round(dt * 1e3, 2),
                          "env_steps_per_s": round(denom / dt)}), flush=True)


if __name__ == "__main__":
    main()
