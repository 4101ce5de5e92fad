"""Reference-CPU PROXY benchmark (BASELINE.md "Reference (CPU)" column).

Measures the in-repo NumPy oracle (pogema_tpu/utils/oracle.py — a direct
loop-based transcription of the reference's documented step semantics,
upstream pogema/envs.py + pogema/grid.py) at the standard config shapes.

This is NOT the upstream package (pip is network-blocked here): it is a
clearly-labeled stand-in with the same algorithmic shape — Python loops
over agents, per-step observation slicing — which is what the reference's
hot path does. Expect the real package to land within a small constant
factor of these numbers (it adds wrapper overhead our oracle skips).

One env instance per process is the reference's execution model (users
vectorize with external process pools), so the honest unit here is
env-steps/s for B=1. Run:  python benchmarks/oracle_proxy_bench.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.utils.oracle import OracleEnv

CONFIGS = {
    "A": dict(seed=1, size=8, density=0.3, num_agents=1, obs_radius=5,
              max_episode_steps=10_000_000),
    "B": dict(seed=2, size=16, density=0.3, num_agents=8, obs_radius=5,
              max_episode_steps=10_000_000),
    "C": dict(seed=3, size=64, density=0.3, num_agents=64, obs_radius=5,
              max_episode_steps=10_000_000, collision_system="priority"),
    "D": dict(seed=4, size=64, density=0.3, num_agents=128, obs_radius=5,
              max_episode_steps=10_000_000, on_target="restart"),
}
STEPS = {"A": 20000, "B": 5000, "C": 600, "D": 300}


def bench_one(name, kwargs, steps, trials=3):
    cfg = GridConfig(**kwargs)
    maze = name in ("C", "D")  # config C/D use maze-style worlds
    core = PogemaCore(cfg, num_envs=1, maze=maze, device="cpu")
    state, _ = core.reset(core.make_key(cfg.seed), with_obs=False)
    obstacles = np.asarray(state.obstacles[0])
    agents = np.asarray(state.agents_xy[0])
    targets = np.asarray(state.targets_xy[0])
    free = np.argwhere(obstacles == 0)
    scfg = core.cfg
    rng = np.random.default_rng(0)
    best = 0.0
    for _ in range(trials):
        env = OracleEnv(scfg, obstacles, agents, targets)
        actions = rng.integers(0, 5, size=(steps, scfg.num_agents))
        t0 = time.perf_counter()
        for t in range(steps):
            _, _, _, on_goal = env.step(actions[t])
            if scfg.on_target == "restart":
                # naive LifeLong respawn (the reference redraws a free
                # cell per reached goal; same algorithmic shape)
                for i, g in enumerate(on_goal):
                    if g:
                        env.targets_xy[i] = tuple(
                            free[rng.integers(len(free))])
            env.observe()
        dt = time.perf_counter() - t0
        best = max(best, steps / dt)
    return best


def main():
    out = {}
    for name, kwargs in CONFIGS.items():
        rate = bench_one(name, kwargs, STEPS[name])
        out[name] = round(rate, 1)
        print(f"config {name}: {rate:,.0f} env-steps/s "
              f"(1 env/process, NumPy oracle proxy)", flush=True)
    print(json.dumps({"metric": "oracle-proxy env-steps/s (B=1)",
                      "values": out}))


if __name__ == "__main__":
    main()
