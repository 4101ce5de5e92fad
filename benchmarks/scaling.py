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
import os
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


def _spawn_loopback(nproc: int, pin_cores: bool):
    """Spawn an nproc-process jax.distributed CPU loopback running the
    fused train step (scaling_train_worker.py); each worker pinned to
    one core so processes never share cores. Returns (max worker
    seconds, loss) — the SPMD program is one computation, so the slowest
    process is the wall time."""
    import os
    import socket
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    workers = []
    for pid in range(nproc):
        argv = [sys.executable,
                os.path.join(repo, "benchmarks", "scaling_train_worker.py"),
                f"localhost:{port}", str(pid), str(nproc)]
        if pin_cores:
            argv = ["taskset", "-c", str(pid)] + argv
        workers.append(subprocess.Popen(
            argv, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        ))
    times, loss = [], None
    for w in workers:
        out, err = w.communicate(timeout=600)
        if w.returncode != 0:
            raise RuntimeError(f"worker failed:\n{err[-3000:]}")
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, _, dt, ls = line.split()
                times.append(float(dt))
                loss = float(ls)
    assert len(times) == nproc, times
    return max(times), loss


def train_loopback_main(procs):
    """Weak-scaling table for the fused train step over 1→N loopback
    processes (VERDICT r2 item 4): per-process envs fixed at
    scaling_train_worker.ENVS_PER_PROC, efficiency = T(1)/T(N) (ideal
    weak scaling keeps wall time flat as global batch grows N×)."""
    from scaling_train_worker import ENVS_PER_PROC, ITERS, ROLLOUT

    pin = len(os.sched_getaffinity(0)) >= max(procs)
    base = None
    rows = []
    for n in procs:
        # min-of-2 spawns: gloo rendezvous + compile jitter is real
        dt = min(_spawn_loopback(n, pin)[0] for _ in range(2))
        sps = n * ENVS_PER_PROC * ROLLOUT * ITERS / dt
        if base is None:
            base = dt
        rows.append({
            "processes": n,
            "global_envs": n * ENVS_PER_PROC,
            "train_env_steps_per_s": round(sps),
            "weak_scaling_efficiency": round(base / dt, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def train_virtual_main(devices_list):
    """Weak-scaling over 1→D virtual CPU devices in ONE process: spawns
    a child per point (XLA_FLAGS must be set before the interpreter
    starts). All virtual devices share the host's cores, so this
    validates the sharded program + measures partitioning overhead, not
    real parallel speedup (that needs the loopback mode or a pod)."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = None
    rows = []
    for d in devices_list:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={d}"
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        code = (
            # sitecustomize imports jax with JAX_PLATFORMS=axon before
            # user code runs — the env var alone is too late; force the
            # cpu backend explicitly (backends are lazy).
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import sys; sys.path.insert(0, %r)\n"
            "sys.path.insert(0, %r)\n"
            "from scaling_train_worker import run, ENVS_PER_PROC\n"
            "dt, loss = run(ENVS_PER_PROC * %d)\n"
            "print('RESULT', dt)\n"
        ) % (repo, os.path.join(repo, "benchmarks"), d)
        dts = []
        for _ in range(2):
            out = subprocess.run([sys.executable, "-c", code], env=env,
                                 capture_output=True, text=True, timeout=600)
            if out.returncode != 0:
                raise RuntimeError(out.stderr[-3000:])
            dts.append(float(out.stdout.strip().split()[-1]))
        dt = min(dts)
        from scaling_train_worker import ENVS_PER_PROC, ITERS, ROLLOUT

        if base is None:
            base = dt
        rows.append({
            "virtual_devices": d,
            "global_envs": d * ENVS_PER_PROC,
            "train_env_steps_per_s": round(
                d * ENVS_PER_PROC * ROLLOUT * ITERS / dt),
            "weak_scaling_efficiency": round(base / dt, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


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
    ap.add_argument("--train-loopback", default=None, metavar="N,N,...",
                    help="weak-scale the fused PPO train step over these "
                         "process counts via a jax.distributed CPU "
                         "loopback (one core per process); prints an "
                         "efficiency row per point")
    ap.add_argument("--train-virtual", default=None, metavar="D,D,...",
                    help="weak-scale the fused PPO train step over these "
                         "virtual-CPU-device counts in one process")
    args = ap.parse_args()

    if args.train_loopback:
        train_loopback_main([int(x) for x in args.train_loopback.split(",")])
        return
    if args.train_virtual:
        train_virtual_main([int(x) for x in args.train_virtual.split(",")])
        return

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
