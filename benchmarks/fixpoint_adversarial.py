"""Priority-fixpoint worst case (VERDICT r2 item 5).

The priority resolver's Jacobi iteration count equals the longest
follow-chain depth of the step (core/collisions.py). Random policies
measure 3-4 at 128 agents; the WORST case is N: a blocked-head follow
chain aligned with index order (agent i stands behind agent i-1 and
moves onto its cell; agent 0's move is into a wall) — each pass can
only propagate "blocked" one link down the chain, so the fixpoint
takes N passes. Under vmap the while_loop runs until EVERY env
converges, so one adversarial env drags the whole batch.

This bench constructs that exact state (a boustrophedon snake of N
agents with a wall-blocked head) at N in {64, 128, 256}, measures the
measured depth and the per-step cost at B envs, and compares against a
random policy on the same shapes — the data behind DESIGN.md
"Priority fixpoint worst case".

Usage: python benchmarks/fixpoint_adversarial.py [--envs 1024]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.core.collisions import priority_fixpoint_depth


def snake_chain(size, n):
    """(agents_xy, chain_actions) for an n-agent follow chain snaking
    through a size x size empty map, head (agent 0) facing the border
    wall. Logical coords. Actions: agent i moves onto agent i-1's cell;
    agent 0 walks into the wall (blocked) — the adversarial pattern."""
    cells = []
    for r in range(size):
        cols = range(size) if r % 2 == 0 else range(size - 1, -1, -1)
        cells.extend((r, c) for c in cols)
    assert n <= len(cells)
    cells = cells[:n]
    # moves: (0,0) stay, (-1,0) up, (1,0) down, (0,-1) left, (0,1) right
    inv = {(0, 0): 0, (-1, 0): 1, (1, 0): 2, (0, -1): 3, (0, 1): 4}
    actions = [3]  # head: row 0 going left into the border wall
    for i in range(1, n):
        dr = cells[i - 1][0] - cells[i][0]
        dc = cells[i - 1][1] - cells[i][1]
        actions.append(inv[(dr, dc)])
    return cells, actions


def measure(core, state, actions_dev, steps):
    """Mean seconds/step for repeated resolution of the same state (the
    state is re-fed each call, so every step pays the same chain)."""
    step = jax.jit(lambda s, a: core.step(s, a)[0])
    out = step(state, actions_dev)
    float(np.asarray(out.agents_xy[0, 0, 0]))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = step(state, actions_dev)
    float(np.asarray(out.agents_xy[0, 0, 0]))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--agents", type=int, default=None, nargs="*")
    args = ap.parse_args()

    for n in args.agents or (64, 128, 256):
        size = max(16, int(np.ceil(n / 16)) * 2 + 2, 24)
        # enough rows: snake uses ceil(n/size) rows
        while size * size < n + size:
            size += 8
        cells, chain_actions = snake_chain(size, n)
        cfg = GridConfig(
            seed=0, size=size, density=0.0, num_agents=n, obs_radius=5,
            max_episode_steps=256, on_target="nothing",
            agents_xy=[list(c) for c in cells],
            targets_xy=[[size - 1, size - 1]] * n,
        )
        core = PogemaCore(cfg, num_envs=args.envs)
        state, _ = core.reset(core.make_key(0), with_obs=False)

        adv = np.tile(np.asarray(chain_actions, np.int32), (args.envs, 1))
        rnd = np.random.default_rng(0).integers(
            0, 5, size=(args.envs, n)).astype(np.int32)
        adv_dev, rnd_dev = jax.device_put(adv), jax.device_put(rnd)

        # obstacles passed as an argument (jit must not close over
        # device arrays — CLAUDE.md).
        depth_fn = jax.jit(jax.vmap(priority_fixpoint_depth,
                                    in_axes=(0, 0, 0, 0)))
        d_adv = int(np.asarray(depth_fn(
            state.obstacles, state.agents_xy, state.active, adv_dev)).max())
        d_rnd = int(np.asarray(depth_fn(
            state.obstacles, state.agents_xy, state.active, rnd_dev)).max())

        t_adv = measure(core, state, adv_dev, args.steps)
        t_rnd = measure(core, state, rnd_dev, args.steps)
        print(json.dumps({
            "agents": n, "envs": args.envs, "map": size,
            "depth_adversarial": d_adv, "depth_random": d_rnd,
            "step_ms_adversarial": round(t_adv * 1e3, 3),
            "step_ms_random": round(t_rnd * 1e3, 3),
            "envsteps_per_s_adversarial": round(args.envs / t_adv),
            "envsteps_per_s_random": round(args.envs / t_rnd),
        }), flush=True)


if __name__ == "__main__":
    main()
