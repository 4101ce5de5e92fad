"""End-to-end PPO training on the vectorized TPU env.

Default path is the FUSED learner: the policy reads EnvState through a
first layer that contracts window one-hots directly against the
embedding weights, so the observation tensor never exists anywhere in
training (models/embed_actor_critic.py; VERDICT r1 item 1). Pass
``--model conv`` for the conventional obs-based conv actor-critic path.

Runs on 1 chip or a pod slice (env batch shards over the mesh 'data'
axis).

  python examples/train_ppo.py --envs 1024 --agents 8 --size 16 --iters 50
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# sitecustomize imports jax at interpreter start with the axon platform,
# making the JAX_PLATFORMS env var a no-op for subprocesses (CLAUDE.md).
# Honor it explicitly so callers (tests, CI, scaling workers) can pin
# this script to a backend — backends are lazy, so this is still early
# enough.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--agents", type=int, default=8)
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--obs-radius", type=int, default=5)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rollout-steps", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--minibatches", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--entropy-coef", type=float, default=0.01)
    ap.add_argument("--obstacle-path", default="auto",
                    choices=["auto", "pre", "windows"],
                    help="fused-learner obstacle strategy; 'auto' picks "
                         "'pre' when the [B, S^2, E] grid embedding fits")
    ap.add_argument("--on-target", default="restart")
    ap.add_argument("--maps", default="random",
                    choices=["random", "maze", "mixed", "mixed-random",
                             "mixed-maze"],
                    help="world distribution: Bernoulli 'random' (default),"
                         " 'maze' (sidewinder), the config-E 'mixed'"
                         " random+maze pool (pogema_tpu.maps.mixed_pool),"
                         " or one kind's half of that pool"
                         " ('mixed-random'/'mixed-maze' — e.g. a"
                         " maze-focused fine-tune phase)")
    ap.add_argument("--density", type=float, default=0.3)
    ap.add_argument("--max-episode-steps", type=int, default=128)
    ap.add_argument("--model", choices=["fused", "recurrent", "conv"],
                    default="fused",
                    help="'fused' = feedforward obs-free EmbedActorCritic; "
                         "'recurrent' = GRU memoryful family (obs-free, "
                         "partial observability lever); 'conv' = obs-based")
    ap.add_argument("--gru-hidden", type=int, default=None,
                    help="recurrent model only: GRU hidden size "
                         "(defaults to --hidden)")
    ap.add_argument("--embed", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--checkpoint", default=None,
                    help="save final params here (loadable by the "
                         "toolbox 'PPO' algo)")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="every k iters, save the FULL TrainState to "
                         "<checkpoint>_state (restart tolerance; "
                         "requires --checkpoint)")
    ap.add_argument("--init-params", default=None,
                    help="warm-start: initialize model params from a "
                         "params checkpoint (the file --checkpoint "
                         "writes) instead of random init. Optimizer "
                         "state and env state start fresh — use "
                         "--resume for bit-exact continuation; this is "
                         "for fine-tuning (e.g. a second phase at lower "
                         "--entropy-coef).")
    ap.add_argument("--resume", action="store_true",
                    help="if <checkpoint>_state exists, restore it and "
                         "continue from the saved iteration (bit-exact "
                         "vs an uninterrupted run — "
                         "tests/test_checkpoint.py)")
    ap.add_argument("--log", default=None,
                    help="CSV file for per-iteration training stats")
    ap.add_argument("--tb-dir", default=None,
                    help="TensorBoard log directory (tensorboardX); same "
                         "scalars as --log")
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="fused model only: run K train steps per host "
                         "dispatch (lax.scan) — each dispatch through a "
                         "tunneled TPU costs a fixed ~31 ms, so K>1 "
                         "recovers it; stats/logging then have K-step "
                         "granularity. --iters (and --checkpoint-every "
                         "if set) must be divisible by K.")
    ap.add_argument("--log-every", type=int, default=1,
                    help="fetch/print stats every k iters (device->host "
                         "fetches through the tunnel cost ~20 ms each; "
                         "raise this when benchmarking)")
    args = ap.parse_args()

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.models import (
        init_embed_params, init_params, init_recurrent_params,
        partition_params,
    )
    from pogema_tpu.parallel import (
        PPOConfig,
        init_fused_train_state,
        init_recurrent_train_state,
        init_train_state,
        make_fused_train_many,
        make_fused_train_step,
        make_mesh,
        make_recurrent_train_many,
        make_recurrent_train_step,
        make_train_step,
        shard_batch,
    )

    cfg = GridConfig(
        seed=0, size=args.size, num_agents=args.agents,
        obs_radius=args.obs_radius, density=args.density,
        max_episode_steps=args.max_episode_steps,
        on_target=args.on_target,
    )
    import jax.numpy as jnp

    maze = args.maps == "maze"
    map_bank = None
    if args.maps.startswith("mixed"):
        from pogema_tpu.maps import mixed_pool

        map_bank = mixed_pool(args.size)
        half = len(map_bank) // 2
        if args.maps == "mixed-random":
            map_bank = map_bank[:half]
        elif args.maps == "mixed-maze":
            map_bank = map_bank[half:]
    env_kw = dict(maze=maze, map_bank=map_bank)

    # LifeLong: 'regen' resampling gives fresh maps/placements/respawn
    # queues each episode (episodes end synchronously at the time limit,
    # so regeneration runs exactly once per episode); cached mode would
    # replay the identical respawn sequence every episode.
    fused_ok = (args.on_target == "restart"
                and cfg.max_episode_steps % args.rollout_steps == 0)
    auto_reset = "regen" if fused_ok else "cached"
    window = cfg.obs_radius * 2 + 1

    if args.model == "fused":
        core = PogemaCore(cfg, num_envs=args.envs, auto_reset_mode=auto_reset,
                          **env_kw)
        model, params = init_embed_params(
            jax.random.key(0), window, embed=args.embed, hidden=args.hidden,
        )
    elif args.model == "recurrent":
        core = PogemaCore(cfg, num_envs=args.envs, auto_reset_mode=auto_reset,
                          **env_kw)
        model, params = init_recurrent_params(
            jax.random.key(0), window, embed=args.embed,
            hidden=args.gru_hidden or args.hidden,
        )
    else:
        # bf16 observations halve rollout HBM traffic; the model computes
        # in bf16 anyway.
        core = PogemaCore(cfg, num_envs=args.envs, obs_dtype=jnp.bfloat16,
                          **env_kw)
        model, params = init_params(jax.random.key(0), window)
    if args.init_params:
        from pogema_tpu.utils.checkpoint import restore_checkpoint

        params = restore_checkpoint(
            os.path.abspath(args.init_params), like=params)
        print(f"warm-started params from {args.init_params}")
    ppo = PPOConfig(lr=args.lr, rollout_steps=args.rollout_steps,
                    epochs=args.epochs, minibatches=args.minibatches,
                    entropy_coef=args.entropy_coef,
                    obstacle_path=args.obstacle_path)

    # Append on --resume so a restart doesn't truncate the pre-crash
    # learning curve; the header is written only when the file is empty.
    log_file = open(args.log, "a" if args.resume else "w") if args.log else None
    if log_file:
        log_file.seek(0, 2)  # append-mode tell() is 0 until first write
    tb_writer = None
    if args.tb_dir:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(args.tb_dir)

    mesh = make_mesh()
    with mesh:
        params = partition_params(params, mesh)
        if args.model in ("fused", "recurrent"):
            if args.model == "fused":
                ts, tx = init_fused_train_state(core, model, params, ppo,
                                                jax.random.key(1))
                mk_one, mk_many = make_fused_train_step, make_fused_train_many
            else:
                ts, tx = init_recurrent_train_state(core, model, params, ppo,
                                                    jax.random.key(1))
                mk_one = make_recurrent_train_step
                mk_many = make_recurrent_train_many
            if args.steps_per_dispatch > 1:
                if args.iters % args.steps_per_dispatch:
                    raise SystemExit("--iters must be divisible by "
                                     "--steps-per-dispatch")
                if (args.checkpoint_every
                        and args.checkpoint_every % args.steps_per_dispatch):
                    raise SystemExit("--checkpoint-every must be divisible "
                                     "by --steps-per-dispatch")
                train_step = jax.jit(mk_many(
                    core, model, ppo, tx, args.steps_per_dispatch))
            else:
                train_step = jax.jit(mk_one(core, model, ppo, tx))
        else:
            if args.steps_per_dispatch > 1:
                raise SystemExit("--steps-per-dispatch needs --model fused")
            ts, tx = init_train_state(core, model, params, ppo,
                                      jax.random.key(1))
            ts = ts.replace(obs=shard_batch(ts.obs, mesh))
            train_step = jax.jit(make_train_step(core, model, ppo, tx))
        ts = ts.replace(
            env_state=shard_batch(ts.env_state, mesh),
            initial_env_state=shard_batch(ts.initial_env_state, mesh),
        )
        if args.model == "recurrent":
            ts = ts.replace(h=shard_batch(ts.h, mesh))

        import numpy as np

        # orbax/tensorstore requires ABSOLUTE paths (a relative
        # --checkpoint-every save raises mid-run and kills training).
        if args.checkpoint:
            args.checkpoint = os.path.abspath(args.checkpoint)
        state_path = f"{args.checkpoint}_state" if args.checkpoint else None
        start_iter = 0
        if args.resume:
            from pogema_tpu.utils.checkpoint import (
                checkpoint_exists, restore_checkpoint,
            )

            if not state_path:
                raise SystemExit("--resume requires --checkpoint")
            if checkpoint_exists(state_path):
                try:
                    saved = restore_checkpoint(
                        state_path, like={"iter": np.int64(0), "ts": ts})
                except Exception as e:
                    if "obstacle_nibbles" in str(e):
                        # EnvState grew this (purely derived) leaf when the
                        # nibble-packed lookup landed; orbax refuses
                        # structure mismatches (a None template leaf is
                        # also treated as structural). Re-save under the
                        # current format with the matching older commit,
                        # or restart — the leaf cannot be auto-filled
                        # through orbax's typed restore.
                        raise SystemExit(
                            f"{state_path} predates the EnvState "
                            "obstacle_nibbles field (pre-nibble-lookup "
                            "checkpoint); resume it with the commit that "
                            "wrote it, or restart training")
                    raise
                ts, start_iter = saved["ts"], int(saved["iter"])
                if start_iter % args.steps_per_dispatch:
                    raise SystemExit(
                        f"resumed iter {start_iter} is not aligned with "
                        f"--steps-per-dispatch {args.steps_per_dispatch}")
                print(f"resumed from {state_path} at iter {start_iter}")

        steps_per_iter = args.envs * args.rollout_steps
        t0 = time.perf_counter()
        it_last = start_iter
        kd = args.steps_per_dispatch
        for it in range(start_iter, args.iters, kd):
            ts, stats = train_step(ts)
            it = it + kd - 1  # last train step of this dispatch
            if args.checkpoint_every and (it + 1) % args.checkpoint_every == 0:
                from pogema_tpu.utils.checkpoint import save_checkpoint

                if not state_path:
                    raise SystemExit("--checkpoint-every requires --checkpoint")
                save_checkpoint(state_path,
                                {"iter": np.int64(it + 1), "ts": ts})
            if (it + 1) % args.log_every and it + 1 < args.iters:
                continue
            # ONE stacked device->host fetch (leaf-by-leaf float() pays
            # ~20 ms of tunnel latency per scalar).
            keys = sorted(stats)
            vals = np.asarray(jnp.stack([stats[k] for k in keys]))
            host = dict(zip(keys, map(float, vals)))
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            sps = steps_per_iter * (it + 1 - it_last) / dt
            it_last = it + 1
            metric = (
                f"throughput {host.get('episode_avg_throughput', 0):.3f}"
                if args.on_target == "restart"
                else f"ISR {host.get('episode_ISR', 0):.3f}"
            )
            print(
                f"iter {it:4d}  reward/step {host['reward_per_step']:.4f}  "
                f"{metric}  loss {host['loss']:.4f}  "
                f"entropy {host['entropy']:.3f}  "
                f"{sps:,.0f} env-steps/s",
                flush=True,
            )
            if log_file:
                if log_file.tell() == 0:  # first logged row (not nec. it 0)
                    print("iter,env_steps_per_s,"
                          + ",".join(sorted(host)), file=log_file)
                print(f"{it},{sps:.1f},"
                      + ",".join(f"{host[k]:.6g}" for k in sorted(host)),
                      file=log_file, flush=True)
            if tb_writer:
                tb_writer.add_scalar("perf/env_steps_per_s", sps, it)
                for k, v in host.items():
                    tb_writer.add_scalar(f"train/{k}", v, it)
        if log_file:
            log_file.close()
        if tb_writer:
            tb_writer.close()
        if args.checkpoint:
            from pogema_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(args.checkpoint, ts.params)
            print(f"saved params to {args.checkpoint}")


if __name__ == "__main__":
    main()
