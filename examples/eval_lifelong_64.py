"""Head-to-head LifeLong evaluation at reference scale-C shape:
64 agents on a 64x64 grid, on_target='restart', unseen seeds.

Compares the trained PPO checkpoint, the decentralized A* baseline, the
centralized batched planner ("Planner", MAPF obs), and random, on
episode_avg_throughput (goals per step, the LifeLong metric).

Usage: python examples/eval_lifelong_64.py [checkpoint] [seeds...]
"""

import json
import sys

sys.path.insert(0, "/root/repo")

# honor JAX_PLATFORMS in code (sitecustomize pre-imports jax; the env
# var alone is a no-op). The B=1 eval loop belongs on CPU.
import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from pogema_tpu.toolbox import evaluate

ckpt = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.ckpt_ppo64"
seeds = [int(s) for s in sys.argv[2:]] or [1001, 1002, 1003]

base = dict(size=64, density=0.3, num_agents=64, obs_radius=5,
            on_target="restart", max_episode_steps=128)

results = {}
results["random"] = evaluate(dict(base), algo="random", seeds=seeds)["env"]
results["A*"] = evaluate(dict(base, observation_type="POMAPF"),
                         algo="A*", seeds=seeds)["env"]
results["Planner"] = evaluate(dict(base, observation_type="MAPF"),
                              algo="Planner", seeds=seeds)["env"]
results["PPO"] = evaluate(dict(base), algo="PPO",
                          algo_kwargs={"checkpoint": ckpt},
                          seeds=seeds)["env"]

for name, m in results.items():
    print(json.dumps({"algo": name,
                      "avg_throughput": round(m.get("avg_throughput", 0), 4),
                      "ep_length": m.get("ep_length")}))
