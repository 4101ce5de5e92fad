"""Evaluate the scripted A* baseline over a config grid (the reference
README's canonical usage, via the toolbox harness).

  python examples/eval_astar.py
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

results = evaluate(
    {
        "random-8": dict(size=8, density=0.3, num_agents=4, obs_radius=3,
                         max_episode_steps=64, observation_type="POMAPF"),
        "random-16": dict(size=16, density=0.3, num_agents=8, obs_radius=3,
                          max_episode_steps=128, observation_type="POMAPF"),
        "warehouse": dict(map_name="warehouse-16x16", num_agents=8,
                          obs_radius=3, max_episode_steps=128,
                          observation_type="POMAPF"),
    },
    algo="A*",
    seeds=[0, 1, 2],
)
print(json.dumps(results, indent=2))
