"""Batched planner evaluation throughput (core/planner.py).

Measures the full eval pipeline on device: reset -> per-agent BFS
distance fields -> greedy-descent rollout to the time limit, as one
jitted program. Contrast: the reference evaluates scripted baselines by
running one host A* per agent per step (SURVEY.md §3.4) — roughly
10^2-10^3 env-steps/s per process; here whole batches evaluate at env
speed.

Usage: python benchmarks/planner_bench.py [--envs 1024] [--agents 8]
       [--size 16] [--episodes 3]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.core.planner import evaluate_planner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--agents", type=int, default=8)
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--density", type=float, default=0.3)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--episodes", type=int, default=3)
    args = ap.parse_args()

    cfg = GridConfig(seed=0, size=args.size, density=args.density,
                     num_agents=args.agents, obs_radius=5,
                     max_episode_steps=args.steps)
    core = PogemaCore(cfg, num_envs=args.envs, device="default")

    # Warm the compile cache.
    _, m = evaluate_planner(core, seed=0)
    float(np.mean(np.asarray(m["ISR"])))

    best = float("inf")
    isr = csr = 0.0
    for ep in range(args.episodes):
        t0 = time.perf_counter()
        _, m = evaluate_planner(core, seed=ep + 1)
        isr = float(np.mean(np.asarray(m["ISR"])))  # fetch forces sync
        csr = float(np.mean(np.asarray(m["CSR"])))
        best = min(best, time.perf_counter() - t0)

    steps = args.envs * args.steps
    print(json.dumps({
        "metric": f"planner eval env-steps/s ({args.agents} agents, "
                  f"{args.size}x{args.size}, {args.envs} envs)",
        "value": round(steps / best),
        "unit": "env-steps/s",
        "ISR": round(isr, 3), "CSR": round(csr, 3),
        "episode_s": round(best, 3),
    }))


if __name__ == "__main__":
    main()
