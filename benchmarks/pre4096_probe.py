"""Headline-scale (config C x 4) TRAINING probe: 4096 envs x 64 agents
x 64x64 maze, fused 'pre' path (VERDICT r2 item 2).

Round 2 left this unmeasured: the one-shot minibatch loss materializes
one-hot transients scaling with T_mb*B*N*S^2 (~17 GB at this shape), so
obstacle_path='auto' silently fell back to the ~7x slower 'windows'
path. scan_minibatch_time (parallel/learner.py loss_fn_scan_t) caps the
transients at one timestep's worth; this probe measures the fixed path
at 4096 and reports steps/s + an MFU estimate from XLA's own FLOP count.

Usage: python benchmarks/pre4096_probe.py [--envs 4096] [--embed 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.models import init_embed_params
from pogema_tpu.parallel import (
    PPOConfig, init_fused_train_state, make_fused_train_step,
)

V5E_PEAK_BF16 = 197e12  # one v5e chip, bf16 MXU peak FLOP/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--agents", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--embed", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--rollout", type=int, default=64)
    ap.add_argument("--minibatches", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--path", default="pre",
                    choices=["pre", "windows", "auto"])
    ap.add_argument("--scan-time", default="auto",
                    choices=["auto", "true", "false"])
    args = ap.parse_args()

    scan_t = {"auto": None, "true": True, "false": False}[args.scan_time]
    cfg = GridConfig(seed=0, size=args.size, density=0.3,
                     num_agents=args.agents, obs_radius=5,
                     max_episode_steps=2 * args.rollout,
                     on_target="restart")
    core = PogemaCore(cfg, num_envs=args.envs, auto_reset_mode="regen")
    model, params = init_embed_params(
        jax.random.key(0), core.cfg.window,
        embed=args.embed, hidden=args.hidden)
    ppo = PPOConfig(rollout_steps=args.rollout, epochs=args.epochs,
                    minibatches=args.minibatches,
                    obstacle_path=args.path,
                    scan_minibatch_time=scan_t)
    ts, tx = init_fused_train_state(core, model, params, ppo,
                                    jax.random.key(1))
    step = jax.jit(make_fused_train_step(core, model, ppo, tx))

    lowered = step.lower(ts)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    ts, stats = step(ts)
    float(stats["loss"])  # sync past compile+warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        ts, stats = step(ts)
    loss = float(stats["loss"])  # sync
    dt = (time.perf_counter() - t0) / args.iters

    env_steps = args.envs * args.rollout
    print(json.dumps({
        "envs": args.envs, "agents": args.agents, "size": args.size,
        "embed": args.embed, "path": args.path, "scan_time": args.scan_time,
        "train_step_s": round(dt, 4),
        "env_steps_per_s": round(env_steps / dt),
        "agent_steps_per_s": round(env_steps * args.agents / dt),
        "xla_flops_per_step": flops,
        "mfu_vs_v5e_bf16_peak": round(flops / dt / V5E_PEAK_BF16, 4)
        if flops else None,
        "loss": loss,
    }), flush=True)


if __name__ == "__main__":
    main()
