"""External-consumer throughput at config-C shape through the
PogemaVectorEnv adapter (the NumPy rim non-JAX frameworks call).

Measures the full adapter loop — jitted auto-reset step + ONE bundled
device->host fetch of (obs, final obs, rewards, flags, metrics) per call
— against the measured in-program ceiling for materialized-obs consumers
(289-530k env-steps/s at this shape, RESULTS.md "obs consumption"). The
adapter adds host<->device transfer of the obs tensor each step, so it
lands below the in-program ceiling; this number is the honest "what an
external SampleFactory/CleanRL-style learner gets".

Usage: python benchmarks/vector_env_probe.py [--envs 4096] [--steps 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

from pogema_tpu import GridConfig, PogemaVectorEnv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--layouts", default="grid,packed")
    args = ap.parse_args()

    for layout in args.layouts.split(","):
        import jax.numpy as jnp

        env = PogemaVectorEnv(
            GridConfig(seed=0, size=64, density=0.3, num_agents=64,
                       obs_radius=5, max_episode_steps=128,
                       on_target="finish"),
            num_vec_envs=args.envs, obs_layout=layout, maze=True,
            obs_dtype=jnp.bfloat16)
        obs, _ = env.reset(seed=0)
        rng = np.random.default_rng(0)
        actions = rng.integers(0, 5, size=(args.steps, env.num_envs))
        env.step(actions[0])  # warm the jit
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for t in range(args.steps):
                obs, rew, term, trunc, infos = env.step(actions[t])
            dt = time.perf_counter() - t0
            best = max(best, args.envs * args.steps / dt)
        print(json.dumps({
            "adapter": "PogemaVectorEnv", "obs_layout": layout,
            "obs_shape": list(obs.shape), "envs": args.envs,
            "env_steps_per_s": round(best),
        }), flush=True)


if __name__ == "__main__":
    main()
