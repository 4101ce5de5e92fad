"""Worker for the distributed train-step scaling benchmark
(benchmarks/scaling.py --train-loopback): one process of an N-process
``jax.distributed`` CPU loopback mesh running the fused sharded PPO
train step, timed after compile.

Weak scaling: every process owns ENVS_PER_PROC envs (global batch =
N * ENVS_PER_PROC), so per-process compute is constant and the
1→N throughput ratio isolates the SPMD/collective overhead — the
loopback stand-in for the "scaling efficiency 1→N hosts" half of the
primary metric (BASELINE.md) until a pod slice exists. The parent pins
each worker to one core (taskset) so N processes never fight over the
host's cores.

Prints: RESULT <pid> <seconds-for-ITERS-steps> <loss>
"""

import sys
import time

ENVS_PER_PROC = 64
AGENTS = 8
SIZE = 16
ROLLOUT = 32
WARMUP = 2
ITERS = 5


def run(num_envs: int):
    """Build the fused sharded train step over ALL visible devices and
    time ITERS steps after WARMUP. Returns (seconds, loss). Used by the
    loopback workers (global multi-process mesh) and by the virtual-
    device mode (single process)."""
    import jax

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.models import init_embed_params
    from pogema_tpu.parallel import (
        PPOConfig, init_fused_train_state, make_fused_train_step, make_mesh,
    )
    from pogema_tpu.parallel.mesh import global_batch_from_host, shard_batch

    cfg = GridConfig(seed=0, size=SIZE, density=0.3, num_agents=AGENTS,
                     obs_radius=5, max_episode_steps=2 * ROLLOUT,
                     on_target="restart")
    core = PogemaCore(cfg, num_envs=num_envs, auto_reset_mode="regen")
    model, params = init_embed_params(jax.random.key(0), core.cfg.window,
                                      embed=32, hidden=32)
    ppo = PPOConfig(rollout_steps=ROLLOUT, epochs=1, minibatches=2)
    ts, tx = init_fused_train_state(core, model, params, ppo,
                                    jax.random.key(1))

    mesh = make_mesh(data=jax.device_count(), model=1)
    put = (global_batch_from_host if jax.process_count() > 1
           else shard_batch)
    with mesh:
        ts = ts.replace(
            env_state=put(ts.env_state, mesh),
            initial_env_state=put(ts.initial_env_state, mesh),
        )
        train_step = jax.jit(make_fused_train_step(core, model, ppo, tx))
        for _ in range(WARMUP):
            ts, stats = train_step(ts)
        float(stats["loss"])  # sync: compile + warmup fully done
        t0 = time.perf_counter()
        for _ in range(ITERS):
            ts, stats = train_step(ts)
        loss = float(stats["loss"])  # sync
        dt = time.perf_counter() - t0
    return dt, loss


def main():
    coordinator, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=nproc, process_id=pid
    )
    sys.path.insert(0, "/root/repo")
    dt, loss = run(ENVS_PER_PROC * nproc)
    print(f"RESULT {pid} {dt:.6f} {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
