"""Benchmark matrix — the BASELINE.md config table (A-E), one JSON line
per config.

Usage: python benchmarks/run.py [A B C D E] [--steps 256]

Metric: env-steps/s (one env-step = one step of one env instance; a
jitted call over B envs counts as B). Timing is best-of-3 with a forced
scalar fetch (see bench.py for why block_until_ready is not enough on the
tunneled axon backend).
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")

CONFIGS = {
    # BASELINE.json configs A-E
    "A": dict(envs=1, agents=1, size=8, density=0.3, obs_radius=5, maze=False),
    "B": dict(envs=256, agents=8, size=16, density=0.3, obs_radius=5, maze=False),
    "C": dict(envs=4096, agents=64, size=64, density=0.3, obs_radius=5, maze=True),
    "D": dict(envs=4096, agents=128, size=64, density=0.3, obs_radius=5,
              maze=False, on_target="restart"),
    "E": dict(envs=8192, agents=256, size=128, density=0.3, obs_radius=5,
              maze="mixed"),
}


def make_mixed_bank(size: int, k: int = 64):
    """Config E 'mixed random+maze pool' — now a library feature
    (pogema_tpu.maps.mixed_pool)."""
    from pogema_tpu.maps import mixed_pool

    return mixed_pool(size, k)


def run_config(name: str, steps: int, collision_system: str) -> dict:
    from pogema_tpu import GridConfig, PogemaCore

    spec = dict(CONFIGS[name])
    envs = spec.pop("envs")
    # Config E runs AT SPEC (8192 envs) on a single chip since the
    # obs-free reset landed: the old OOM was never the step path — it was
    # the initial [B, N, 3, 11, 11] obs tensor, whose T(8,128) tile
    # padding alone is ~16 GB at this shape (benchmarks/config_e_probe.py
    # isolates it). No clamp needed.
    clamped_from = None
    agents = spec.pop("agents")
    size = spec.pop("size")
    maze = spec.pop("maze")
    on_target = spec.pop("on_target", "finish")
    density = spec.pop("density")
    obs_radius = spec.pop("obs_radius")

    cfg = GridConfig(
        seed=0, size=size, num_agents=agents, obs_radius=obs_radius,
        density=density, max_episode_steps=128, on_target=on_target,
        collision_system=collision_system,
    )
    bank = make_mixed_bank(size) if maze == "mixed" else None
    core = PogemaCore(
        cfg, num_envs=envs, maze=(maze is True), map_bank=bank
    )
    step_auto = core._make_step_auto()
    # Obs-free reset: the bench scan never reads obs, and at config-E
    # scale the initial obs tensor's tile padding alone OOMs the chip.
    state, _ = core.reset(core.make_key(0), with_obs=False)

    # Tiny-batch configs are latency-bound, not FLOP-bound: measured on a
    # v5e at B=1, a scan body of JUST split+randint costs 22.3 us/step
    # while the full env step costs 25.3 (benchmarks/config_a_probe.py) —
    # the sequential threefry chain IS the floor. Pre-sampling all actions
    # in one batched randint before the scan (still inside the timed
    # program) removes it; the scan then measures the env, not the RNG.
    # At large B the in-loop RNG is overlapped/cheap and pre-sampling
    # would add [T, B, N] HBM traffic, so keep it in-loop there.
    presample = envs * agents <= 1024
    unroll = 8 if presample else 1

    def run(state, initial_state, key, num_steps):
        if presample:
            actions = jax.random.randint(
                key, (num_steps, envs, agents), 0, 5, dtype=jnp.int32
            )

            def one(s, a):
                ns, _, res, _, _ = step_auto(s, initial_state, a)
                return ns, res.rewards.sum()

            s, rews = lax.scan(one, state, actions, unroll=unroll)
            return s, rews.sum()

        def one(carry, _):
            s, k = carry
            k, kk = jax.random.split(k)
            a = jax.random.randint(kk, (envs, agents), 0, 5, dtype=jnp.int32)
            ns, _, res, _, _ = step_auto(s, initial_state, a)
            return (ns, k), res.rewards.sum()

        (s, _), rews = lax.scan(one, (state, key), None, length=num_steps,
                                unroll=unroll)
        return s, rews.sum()

    run_jit = jax.jit(run, static_argnums=(3,))
    s2, _ = run_jit(state, state, core.make_key(1), steps)
    jax.block_until_ready(s2)
    dt = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        _, rew = run_jit(s2, state, core.make_key(2 + trial), steps)
        float(rew)
        dt = min(dt, time.perf_counter() - t0)
    value = envs * steps / dt
    out_extra = {"clamped_from_envs": clamped_from} if clamped_from else {}
    return {
        "config": name,
        **out_extra,
        "metric": f"env-steps/s ({agents} agents, {size}x{size}, {envs} envs, "
                  f"{on_target}, {collision_system})",
        "value": round(value),
        "unit": "env-steps/s",
        "steps_timed": steps,
        "sec_per_vec_step_ms": round(dt / steps * 1e3, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=["A", "B", "C", "D"])
    # Each timed trial must run >= ~0.5 s: the tunneled dispatch + scalar
    # fetch costs a fixed ~31 ms/trial (measured config C: 0.772 ms/step
    # at 256 steps vs 0.651 at 1024), which at short scans hides up to
    # 5x of the fast configs' steady-state rate (B: 1.6M apparent at 256
    # steps vs 9.0M at 16384). Default (0) = per-config.
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--collision-system", default="priority")
    args = ap.parse_args()
    # E runs at spec (8192 envs) since the obs-free reset: a 1024-step
    # trial is ~5 s, so the fixed ~31 ms dispatch is <1%.
    per_config_steps = {"A": 8192, "B": 16384, "C": 2048, "D": 1024, "E": 1024}
    for name in args.configs:
        steps = args.steps or per_config_steps.get(name, 1024)
        out = run_config(name, steps, args.collision_system)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
