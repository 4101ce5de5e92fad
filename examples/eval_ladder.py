"""Head-to-head LifeLong evaluation ladder at any shape (configs C/D/E).

Generalizes eval_lifelong_64.py: PPO checkpoint vs the decentralized A*
baseline, the centralized batched planner ("Planner", MAPF obs), and
random, on episode_avg_throughput (goals per step per agent — the
LifeLong metric), over unseen seeds.

  python examples/eval_ladder.py --agents 128 --size 64 \
      --ckpt /root/repo/.ckpt_rec128 --seeds 1001 1002 1003
  python examples/eval_ladder.py --agents 256 --size 128 --maps mixed \
      --ckpt /root/repo/.ckpt_rec256 --algos random A* Planner PPO
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# sitecustomize pre-imports jax with the axon platform, so the
# JAX_PLATFORMS env var alone is a no-op — honor it in code (backends
# are lazy). The B=1 eval loop belongs on CPU: per-step chip dispatch
# pays ~31 ms of tunnel latency and the engine is bit-exact
# cross-backend.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--density", type=float, default=0.3)
    ap.add_argument("--obs-radius", type=int, default=5)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--maps", default="random",
                    choices=["random", "mixed", "mixed-random",
                             "mixed-maze"],
                    help="'mixed' draws each seed's world uniformly from "
                         "the config-E mixed random+maze pool; "
                         "'mixed-random'/'mixed-maze' restrict the draw "
                         "to one kind (per-kind ladders are reported "
                         "separately and never averaged across kinds — "
                         "VERDICT r4 item 2)")
    ap.add_argument("--braid", type=float, default=0.15,
                    help="maze braid level of the pool (0.0 = the "
                         "historical round-4 perfect mazes)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=[1001, 1002, 1003])
    ap.add_argument("--algos", nargs="+",
                    default=["random", "A*", "Planner", "PPO"])
    args = ap.parse_args()

    from pogema_tpu.toolbox import evaluate

    base = dict(size=args.size, density=args.density,
                num_agents=args.agents, obs_radius=args.obs_radius,
                on_target="restart", max_episode_steps=args.steps)

    pool = None
    if args.maps.startswith("mixed"):
        from pogema_tpu.maps import mixed_pool

        pool = mixed_pool(args.size, braid=args.braid)

    def env_for(seed):
        kw = dict(base)
        kind = None
        if pool is not None:
            import numpy as np

            half = len(pool) // 2
            # Uniform draw over the pool (or over one kind's half),
            # seeded by the eval seed — the same distribution training
            # samples from. (A naive `seed % len(pool)` maps consecutive
            # seeds into ONE half of the half-random/half-maze pool and
            # skews the whole ladder to that map kind.)
            rng = np.random.default_rng(seed)
            if args.maps == "mixed-random":
                idx = int(rng.integers(half))
            elif args.maps == "mixed-maze":
                idx = half + int(rng.integers(len(pool) - half))
            else:
                idx = int(rng.integers(len(pool)))
            kind = "random" if idx < half else "maze"
            kw["map"] = pool[idx].tolist()
        return kw, kind

    results = {}
    for algo in args.algos:
        per_seed, kinds = [], []
        for seed in args.seeds:
            kw, kind = env_for(seed)
            if algo == "A*":
                kw["observation_type"] = "POMAPF"
            elif algo == "Planner":
                kw["observation_type"] = "MAPF"
            akw = ({"checkpoint": args.ckpt} if algo == "PPO" else None)
            m = evaluate(kw, algo=algo, seeds=[seed], algo_kwargs=akw)["env"]
            per_seed.append(m.get("avg_throughput", 0.0))
            kinds.append(kind)
        mean = sum(per_seed) / len(per_seed)
        results[algo] = mean
        row = {"algo": algo, "avg_throughput": round(mean, 4),
               "per_seed": [round(x, 4) for x in per_seed]}
        # Per-kind means, never averaged across kinds (the kinds have
        # incomparable throughput scales).
        for k in ("random", "maze"):
            vals = [x for x, kk in zip(per_seed, kinds) if kk == k]
            if vals:
                row[f"mean_{k}"] = round(sum(vals) / len(vals), 4)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
