"""Worker process for the multi-process ``jax.distributed`` loopback test
(SURVEY.md §4 implication (c); VERDICT r1 item 2).

Launched by tests/test_distributed.py with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<local> in the env
(must be set before the interpreter starts — sitecustomize imports jax).

Runs the FUSED sharded PPO train step over the global (multi-process)
mesh and prints one line:

    RESULT <process_id> <loss> <traj_checksum>

Both processes must print identical values, and they must match the
single-process reference computed by the parent test.
"""

import sys


def build_and_run(num_envs: int, seed: int = 0):
    """Deterministic fused train-step on whatever devices are visible.
    Returns (loss, checksum) as floats; used both by workers (global
    multi-process mesh) and by the parent (single-process reference)."""
    import jax
    import jax.numpy as jnp

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.models import init_embed_params
    from pogema_tpu.parallel import (
        PPOConfig, init_fused_train_state, make_fused_train_step, make_mesh,
    )
    from pogema_tpu.parallel.mesh import global_batch_from_host

    cfg = GridConfig(seed=seed, size=8, density=0.2, num_agents=2,
                     obs_radius=2, max_episode_steps=8, on_target="restart")
    core = PogemaCore(cfg, num_envs=num_envs, auto_reset_mode="regen")
    model, params = init_embed_params(jax.random.key(0), core.cfg.window,
                                      embed=32, hidden=32)
    ppo = PPOConfig(rollout_steps=4, epochs=1, minibatches=2)
    ts, tx = init_fused_train_state(core, model, params, ppo, jax.random.key(1))

    mesh = make_mesh(data=jax.device_count(), model=1)
    with mesh:
        ts = ts.replace(
            env_state=global_batch_from_host(ts.env_state, mesh),
            initial_env_state=global_batch_from_host(ts.initial_env_state, mesh),
        )
        train_step = jax.jit(make_fused_train_step(core, model, ppo, tx))
        for _ in range(2):
            ts, stats = train_step(ts)
        # Position-weighted trajectory checksum, computed IN jit so the
        # result is a replicated scalar addressable from every process.
        import numpy as np

        weights = np.arange(1, 1 + ts.env_state.agents_xy.size,
                            dtype=np.int32)  # host constant (folds into jit)

        @jax.jit
        def checksum(xy):
            return jnp.sum(xy.reshape(-1) * weights)

        chk = int(checksum(ts.env_state.agents_xy))
        loss = float(stats["loss"])
    return loss, chk


def main():
    coordinator, pid, nproc, num_envs = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=nproc, process_id=pid
    )
    sys.path.insert(0, "/root/repo")
    assert jax.process_count() == nproc, jax.process_count()
    loss, chk = build_and_run(num_envs)
    print(f"RESULT {pid} {loss:.10f} {chk}", flush=True)


if __name__ == "__main__":
    main()
