"""Decompose the rollout policy cost per scan step: embedding vs heads
vs sampling vs the log-prob gather. All probes scan T iterations carrying
a dummy state so XLA can't collapse the loop.

Usage: python benchmarks/policy_step_probe.py [--envs 1024 --agents 8]
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
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.models import init_embed_params

    cfg = GridConfig(seed=0, size=args.size, num_agents=args.agents,
                     obs_radius=5, max_episode_steps=128, on_target="restart")
    core = PogemaCore(cfg, num_envs=args.envs, auto_reset_mode="regen")
    model, params = init_embed_params(jax.random.key(0), 11)
    state, _ = core.reset(jax.random.key(1))
    T = args.steps

    def apply_pre(params, e_grid, axy, txy, active):
        return model.apply(params, e_grid, axy, txy, active,
                           method=type(model).from_state_pre)

    e_grid = model.apply(params, state.obstacles,
                         method=type(model).grid_embed)
    e_grid = jax.block_until_ready(e_grid)

    def scan_probe(body):
        @jax.jit
        def run(axy, key):
            def one(carry, _):
                axy, key = carry
                key, k = jax.random.split(key)
                out, axy2 = body(axy, k)
                return (axy2, key), out

            (_, _), outs = lax.scan(one, (axy, key), None, length=T)
            return outs[-1]

        return timeit(run, state.agents_xy, jax.random.key(2))

    # perturb coords each step so the scan body depends on the carry
    def perturb(axy, logits):
        d = (logits[..., :2].sum(-1) > 0).astype(jnp.int32)
        return jnp.clip(axy + d[..., None], 5, args.size + 4)

    def body_apply(axy, k):
        logits, values = apply_pre(params, e_grid, axy, state.targets_xy,
                                   state.active)
        return values.sum(), perturb(axy, logits)

    def body_sample_gather(axy, k):
        logits, values = apply_pre(params, e_grid, axy, state.targets_xy,
                                   state.active)
        actions = jax.random.categorical(k, logits)
        lp = jnp.take_along_axis(
            jax.nn.log_softmax(logits), actions[..., None], axis=-1
        )[..., 0]
        return lp.sum() + values.sum(), perturb(axy, logits)

    def body_sample_onehot(axy, k):
        logits, values = apply_pre(params, e_grid, axy, state.targets_xy,
                                   state.active)
        actions = jax.random.categorical(k, logits)
        oh = (actions[..., None] ==
              jnp.arange(logits.shape[-1], dtype=actions.dtype))
        lp = jnp.sum(jax.nn.log_softmax(logits) * oh, axis=-1)
        return lp.sum() + values.sum(), perturb(axy, logits)

    for name, body in [("apply_only", body_apply),
                       ("apply_sample_gather", body_sample_gather),
                       ("apply_sample_onehot", body_sample_onehot)]:
        dt = scan_probe(body)
        print(json.dumps({"probe": name, "ms": round(dt * 1e3, 2),
                          "us_per_step": round(dt / T * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
