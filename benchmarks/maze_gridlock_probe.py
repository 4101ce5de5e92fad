"""Is the config-E maze pool traversable by a 256-agent team at all?

VERDICT r4 weak #2: on the mixed pool's maze-kind maps every algorithm
— including the privileged centralized planner — scores ~0.05
goals/step, so the maze half of the E ladder cannot distinguish a good
policy from a mediocre one. Two hypotheses:

  (a) structural: a *perfect* maze (1-wide corridors, unique paths,
      `maps.np_maze(braid=0)`) cannot support 256 agents — no passing,
      no alternative routes — and no episode length fixes that;
  (b) episodic: 256 steps is just too short to escape initial gridlock.

This probe runs the centralized Planner (the throughput ceiling — it
reads the whole map) on one 128x128 maze at agent counts 32..256,
episode lengths 256 and 512, and braid levels 0/0.05/0.15/0.3
(braid = fraction of straight walls knocked out, adding loops so agents
can pass). 'random' at 256 agents provides the floor.

Decision input for re-specifying the config-E pool (VERDICT r4 item 2).
CPU (B=1 eval loop; engine is backend-uniform).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

from pogema_tpu.maps import np_maze
from pogema_tpu.toolbox import evaluate


def run(agents, steps, braid, algo="Planner", seed=7):
    grid = np_maze(128, seed=777, braid=braid)
    kw = dict(size=128, density=0.3, num_agents=agents, obs_radius=5,
              on_target="restart", max_episode_steps=steps, map=grid)
    if algo == "Planner":
        kw["observation_type"] = "MAPF"
    t0 = time.perf_counter()
    m = evaluate(kw, algo=algo, seeds=[seed])["env"]
    dt = time.perf_counter() - t0
    row = {"algo": algo, "agents": agents, "steps": steps, "braid": braid,
           "avg_throughput": round(m.get("avg_throughput", 0.0), 4),
           "eval_s": round(dt, 1)}
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    # (a) structural: perfect maze, scaling agent count
    for agents in (32, 64, 128, 256):
        run(agents, 256, 0.0)
    # (b) episodic: does 2x episode length move the 256-agent number?
    run(256, 512, 0.0)
    # braided: loops restore passing — where does 256 become viable?
    for braid in (0.05, 0.15, 0.3):
        run(256, 256, braid)
    # floors/ceilings for calibration
    run(256, 256, 0.15, algo="random")
    run(256, 256, 0.15, algo="A*")
