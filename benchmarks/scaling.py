"""Multi-device scaling benchmark: env batch sharded over the mesh 'data'
axis; reports aggregate env-steps/s and scaling efficiency vs the
single-device run (the second half of the headline metric,
BASELINE.md "scaling eff. 1→N hosts").

On a pod slice this measures real ICI scaling (run under
`jax.distributed`); on a single chip it degenerates to the plain bench.
CPU virtual devices (XLA_FLAGS=--xla_force_host_platform_device_count=N)
validate the sharded program end-to-end but give no meaningful ratios.

  python benchmarks/scaling.py --envs 4096 --agents 64 --size 64
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def measure(core, envs, agents, steps, mesh=None):
    from pogema_tpu.parallel import shard_batch
    from pogema_tpu.parallel.mesh import global_batch_from_host

    step_auto = core._make_step_auto()
    state, _ = core.reset(jax.random.key(0), with_obs=False)
    if mesh is not None:
        # Multi-process: every process holds the identical reset (it is
        # deterministic), so each materializes just its global shards.
        put = global_batch_from_host if jax.process_count() > 1 else shard_batch
        state = put(state, mesh)

    def run(state, initial_state, key, num_steps):
        def one(carry, _):
            s, k = carry
            k, kk = jax.random.split(k)
            a = jax.random.randint(kk, (envs, agents), 0, 5, dtype=jnp.int32)
            ns, _, res, _, _ = step_auto(s, initial_state, a)
            return (ns, k), res.rewards.sum()

        (s, _), rews = lax.scan(one, (state, key), None, length=num_steps)
        return s, rews.sum()

    run_jit = jax.jit(run, static_argnums=(3,))
    s2, _ = run_jit(state, state, jax.random.key(1), steps)
    jax.block_until_ready(s2)
    dt = float("inf")
    for t in range(3):
        t0 = time.perf_counter()
        _, rew = run_jit(s2, state, jax.random.key(2 + t), steps)
        float(rew)
        dt = min(dt, time.perf_counter() - t0)
    return envs * steps / dt


def main():
    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.parallel import initialize_distributed, make_mesh

    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--agents", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: call jax.distributed.initialize() "
                         "(auto-detected coordinator on TPU pods; for a "
                         "manual loopback run pass --coordinator/"
                         "--process-id/--num-processes)")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (loopback testing)")
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. 'cpu' for loopback "
                         "validation; the env's sitecustomize overrides "
                         "JAX_PLATFORMS, so an env var is not enough)")
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        kw = {}
        if args.coordinator is not None:
            kw = dict(coordinator_address=args.coordinator,
                      process_id=args.process_id,
                      num_processes=args.num_processes)
        initialize_distributed(**kw)
    n = len(jax.devices())
    cfg = GridConfig(seed=0, size=args.size, num_agents=args.agents,
                     obs_radius=5, max_episode_steps=128)

    # single-device reference (envs/n so per-device work matches)
    per_dev_envs = args.envs // n
    core1 = PogemaCore(cfg, num_envs=per_dev_envs)
    base = measure(core1, per_dev_envs, args.agents, args.steps)

    mesh = make_mesh()
    coreN = PogemaCore(cfg, num_envs=args.envs)
    with mesh:
        full = measure(coreN, args.envs, args.agents, args.steps, mesh=mesh)

    eff = full / (base * n) if base > 0 else 0.0
    print(json.dumps({
        "devices": n,
        "single_device_env_steps_per_s": round(base),
        "sharded_env_steps_per_s": round(full),
        "scaling_efficiency": round(eff, 3),
        "unit": "env-steps/s",
    }))


if __name__ == "__main__":
    main()
