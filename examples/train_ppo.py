"""End-to-end PPO training on the vectorized TPU env.

Trains the convolutional actor-critic with the sharded PPO learner
(pogema_tpu.parallel) on a MAPF task; logs reward/loss and episode
metrics. Runs on 1 chip or a pod slice (env batch shards over the mesh
'data' axis).

  python examples/train_ppo.py --envs 1024 --agents 8 --size 16 --iters 50
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--agents", type=int, default=8)
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--obs-radius", type=int, default=5)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rollout-steps", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--on-target", default="restart")
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.models import init_params, partition_params
    from pogema_tpu.parallel import (
        PPOConfig,
        init_train_state,
        make_mesh,
        make_train_step,
        shard_batch,
    )

    cfg = GridConfig(
        seed=0, size=args.size, num_agents=args.agents,
        obs_radius=args.obs_radius, max_episode_steps=128,
        on_target=args.on_target,
    )
    import jax.numpy as jnp

    # bf16 observations halve rollout HBM traffic; the model computes in
    # bf16 anyway.
    core = PogemaCore(cfg, num_envs=args.envs, obs_dtype=jnp.bfloat16)
    model, params = init_params(jax.random.key(0), cfg.obs_radius * 2 + 1)
    ppo = PPOConfig(lr=args.lr, rollout_steps=args.rollout_steps)

    mesh = make_mesh()
    with mesh:
        params = partition_params(params, mesh)
        ts, tx = init_train_state(core, model, params, ppo, jax.random.key(1))
        ts = ts.replace(
            env_state=shard_batch(ts.env_state, mesh),
            initial_env_state=shard_batch(ts.initial_env_state, mesh),
            obs=shard_batch(ts.obs, mesh),
        )
        train_step = jax.jit(make_train_step(core, model, ppo, tx))

        steps_per_iter = args.envs * args.rollout_steps
        for it in range(args.iters):
            t0 = time.perf_counter()
            ts, stats = train_step(ts)
            host = {k: float(v) for k, v in stats.items()}
            dt = time.perf_counter() - t0
            metric = (
                f"throughput {host.get('episode_avg_throughput', 0):.3f}"
                if args.on_target == "restart"
                else f"ISR {host.get('episode_ISR', 0):.3f}"
            )
            print(
                f"iter {it:4d}  reward/step {host['reward_per_step']:.4f}  "
                f"{metric}  loss {host['loss']:.4f}  "
                f"entropy {host['entropy']:.3f}  "
                f"{steps_per_iter / dt:,.0f} env-steps/s",
                flush=True,
            )
        if args.checkpoint:
            from pogema_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(args.checkpoint, ts.params)
            print(f"saved params to {args.checkpoint}")


if __name__ == "__main__":
    main()
