"""Peeled Jacobi passes ahead of the fixpoint while_loop (_PEEL).

fixpoint_formulation_probe.py attributed the moves-minus-one-pass gap
(0.14 ms at config C, 0.43 at D) to loop-invariant matrix construction
PLUS while-loop cond stalls. The in-loop _UNROLL=k>1 variant was a
measured negative (extra passes inside the loop are separately
dispatched HBM traffic). Peeling is the other half: k passes INLINED
BEFORE the loop fuse into the surrounding step program, and when the
fixpoint lands within the peel the cond is false on entry — zero loop
trips. Typical measured depth is 3-4 (fixpoint_probe.py), so peel 3-4
should convert most trips into fused ops IF trip stalls (not matrix
build) dominate the gap.

Sweeps collisions._PEEL over the full production step at config C
(4096x64, finish) and config D (4096x128, LifeLong); asserts result
equality vs peel=0 at each setting before timing.

Usage: python benchmarks/fixpoint_peel_probe.py [--steps 2048]
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
from jax import lax

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.core import collisions


def build(config, b):
    if config == "C":
        cfg = GridConfig(seed=0, size=64, density=0.3, num_agents=64,
                         obs_radius=5, max_episode_steps=128,
                         on_target="finish")
        core = PogemaCore(cfg, num_envs=b, maze=True)
    else:  # D
        cfg = GridConfig(seed=0, size=64, density=0.3, num_agents=128,
                         obs_radius=5, max_episode_steps=128,
                         on_target="restart")
        core = PogemaCore(cfg, num_envs=b)
    state, _ = core.reset(jax.random.key(0))
    return core, state


def make_run(core, b, n, steps):
    # Fresh step_auto + fresh jit per _PEEL setting: _PEEL is read at
    # trace time, so the closure must be rebuilt after changing it.
    step_auto = core._make_step_auto()

    @jax.jit
    def run(state, key):
        def body(c, _):
            s, k = c
            k, ka = jax.random.split(k)
            a = jax.random.randint(ka, (b, n), 0, 5, dtype=jnp.int32)
            ns, _, res, _, _ = step_auto(s, state, a)
            return (ns, k), res.rewards.sum()

        (s, _), rew = lax.scan(body, (state, key), None, length=steps)
        return rew.sum(), s.agents_xy.sum()

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--peels", default="0,2,3,4,6")
    args = ap.parse_args()
    peels = [int(p) for p in args.peels.split(",")]

    for config in ("C", "D"):
        core, state = build(config, args.envs)
        n = state.agents_xy.shape[1]
        ref = None
        for peel in peels:
            collisions._PEEL = peel
            run = make_run(core, args.envs, n, args.steps)
            out = run(state, jax.random.key(1))
            got = (float(out[0]), int(out[1]))  # real fetch (tunnel)
            if ref is None:
                ref = got
            # Same PRNG stream + semantics-invariant peel => identical
            # rollout; a mismatch means a real bug (or a TPU miscompile).
            assert got == ref, (config, peel, got, ref)
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(state, jax.random.key(1))
                float(out[0])
                dt = min(dt, time.perf_counter() - t0)
            print(json.dumps({
                "config": config, "peel": peel,
                "ms_per_step": round(dt / args.steps * 1e3, 4),
                "env_steps_per_s": round(args.envs * args.steps / dt),
            }), flush=True)
        collisions._PEEL = 0


if __name__ == "__main__":
    main()
