"""Obs-consuming rollout throughput: grid vs packed layout (VERDICT r2
item 8 — the external-learner contract).

The fused learner never materializes obs, but a SampleFactory-style
consumer does: at config-C scale the [B, N, 3, 11, 11] f32 tensor pays
~12x T(8,128) tile padding per step. obs_layout='packed' emits
[B, N, 3*W*W] (363 -> 384 lanes, 1.06x) — same bits, tile-aligned.
This probe measures an obs-consuming rollout (step_autoreset with obs,
reduced on device so the tunnel fetch isn't timed) for both layouts.

Usage: python benchmarks/obs_layout_probe.py [--envs 4096] [--steps 64]
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


def measure(core, steps, key_seed):
    state, obs = core.reset(core.make_key(key_seed))
    initial = state
    rng = np.random.default_rng(0)
    acts = jax.device_put(rng.integers(
        0, 5, size=(steps, core.num_envs, core.cfg.num_agents)
    ).astype(np.int32))

    @jax.jit
    def scan_steps(state, initial, obs0, acts):
        # initial passed as an argument — jit must not close over
        # device arrays (CLAUDE.md).
        def one(carry, a):
            s, _ = carry
            s, obs, _, _, _ = core._step_auto(s, initial, a)
            # An external learner receives obs as a jit OUTPUT — the
            # tensor is materialized in HBM in its layout. A bare
            # obs.sum() lets XLA fuse production into the reduction and
            # the layouts measure identical (first version of this
            # probe did exactly that); the barrier forces the
            # materialization the external contract implies.
            obs = jax.lax.optimization_barrier(obs)
            return (s, obs.sum()), None

        (state, osum), _ = jax.lax.scan(one, (state, obs0.sum()), acts)
        return state, osum

    s, osum = scan_steps(state, initial, obs, acts)
    float(np.asarray(osum))  # compile + sync
    t0 = time.perf_counter()
    s, osum = scan_steps(state, initial, obs, acts)
    checksum = float(np.asarray(osum))
    dt = time.perf_counter() - t0
    return core.num_envs * steps / dt, checksum


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--agents", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    cfg = GridConfig(seed=0, size=args.size, density=0.3,
                     num_agents=args.agents, obs_radius=5,
                     max_episode_steps=128, on_target="restart")
    for layout in ("grid", "packed"):
        core = PogemaCore(cfg, num_envs=args.envs, obs_layout=layout,
                          obs_dtype=jnp.bfloat16)
        sps, chk = measure(core, args.steps, key_seed=7)
        print(json.dumps({
            "layout": layout, "envs": args.envs, "agents": args.agents,
            "obs_envsteps_per_s": round(sps), "obs_checksum": chk,
        }), flush=True)


if __name__ == "__main__":
    main()
