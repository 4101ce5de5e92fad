"""Break the fused train step into components and time each on the TPU.

Usage: python benchmarks/profile_fused.py [--envs 1024 --agents 8 ...]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timeit(fn, *args, trials=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a real fetch (tunneled backend: block_until_ready lies)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--agents", type=int, default=8)
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--rollout-steps", type=int, default=64)
    ap.add_argument("--embed", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--window-group", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--minibatches", type=int, default=4)
    args = ap.parse_args()

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.models import EmbedActorCritic, init_embed_params
    from pogema_tpu.parallel import (
        PPOConfig, init_fused_train_state, make_fused_train_step,
        make_state_rollout_fn,
    )
    from pogema_tpu.parallel.learner import compute_gae

    cfg = GridConfig(seed=0, size=args.size, num_agents=args.agents,
                     obs_radius=5, max_episode_steps=128, on_target="restart")
    core = PogemaCore(cfg, num_envs=args.envs, auto_reset_mode="regen")
    window = 11
    model, params = init_embed_params(jax.random.key(0), window,
                                      embed=args.embed, hidden=args.hidden,
                                      window_group=args.window_group)
    ppo = PPOConfig(rollout_steps=args.rollout_steps, epochs=args.epochs,
                    minibatches=args.minibatches)
    ts, tx = init_fused_train_state(core, model, params, ppo, jax.random.key(1))

    def apply_state(params, grids, axy, txy, active):
        return model.apply(params, grids, axy, txy, active,
                           method=EmbedActorCritic.from_state)

    T, B, N = args.rollout_steps, args.envs, args.agents
    steps = T * B

    # 1) full train step
    train_step = jax.jit(make_fused_train_step(core, model, ppo, tx))
    dt = timeit(lambda ts: train_step(ts)[1]["loss"], ts)
    print(f"train_step total: {dt*1e3:8.1f} ms  ({steps/dt:,.0f} env-steps/s)")

    # 2) rollout alone
    rollout = make_state_rollout_fn(core, apply_state, T)
    roll_jit = jax.jit(lambda p, s, i, k: rollout(p, s, i, k)[2].rewards.sum())
    dt_r = timeit(roll_jit, ts.params, ts.env_state, ts.initial_env_state,
                  jax.random.key(2))
    print(f"rollout ({T} steps): {dt_r*1e3:8.1f} ms")

    # 3) env-only rollout (no policy: fixed random actions inside scan)
    step_auto = core._make_step_auto(with_obs=False)

    def env_only(s, i, key):
        def one(carry, _):
            st, k = carry
            k, kk = jax.random.split(k)
            a = jax.random.randint(kk, (B, N), 0, 5)
            ns, _, res, _, _ = step_auto(st, i, a)
            return (ns, k), res.rewards.sum()
        (_, _), r = jax.lax.scan(one, (s, key), None, length=T)
        return r.sum()

    dt_e = timeit(jax.jit(env_only), ts.env_state, ts.initial_env_state,
                  jax.random.key(3))
    print(f"env-only ({T} steps): {dt_e*1e3:8.1f} ms")

    # 4) single fused forward at rollout shape
    fwd = jax.jit(lambda p, s: apply_state(p, s.obstacles, s.agents_xy,
                                           s.targets_xy, s.active)[0].sum())
    dt_f = timeit(fwd, ts.params, ts.env_state)
    print(f"fused fwd [B={B}, N={N}]: {dt_f*1e3:8.2f} ms  (x{T} = {dt_f*T*1e3:.1f} ms)")

    # 5) loss fwd+bwd at minibatch shape
    mb = steps // args.minibatches
    p_sz = core.cfg.padded_size
    import numpy as np
    rng = np.random.default_rng(0)
    grids_mb = jnp.asarray((rng.random((mb, p_sz, p_sz)) < 0.25).astype(np.float32),
                           jnp.bfloat16)
    r = 5
    axy = jnp.asarray(rng.integers(r, r + args.size, (mb, N, 2)), jnp.int32)
    txy = jnp.asarray(rng.integers(r, r + args.size, (mb, N, 2)), jnp.int32)
    act = jnp.ones((mb, N), bool)
    actions = jnp.asarray(rng.integers(0, 5, (mb, N)), jnp.int32)
    flt = jnp.asarray(rng.random((mb, N)), jnp.float32)

    def loss(params):
        logits, values = apply_state(params, grids_mb, axy, txy, act)
        lp = jnp.take_along_axis(jax.nn.log_softmax(logits),
                                 actions[..., None], -1)[..., 0]
        return (lp * flt).mean() + (values ** 2).mean()

    grad = jax.jit(lambda p: jax.tree.leaves(jax.grad(loss)(p))[0].sum())
    dt_g = timeit(grad, ts.params)
    n_mb = args.epochs * args.minibatches
    print(f"loss fwd+bwd [mb={mb}]: {dt_g*1e3:8.1f} ms  (x{n_mb} = {dt_g*n_mb*1e3:.1f} ms)")

    # 6) GAE + shuffle-gather cost proxy: permute the compact dataset
    data = (axy, txy, act, actions, flt, flt)
    big = jax.tree.map(lambda x: jnp.tile(x, (args.minibatches,) + (1,) * (x.ndim - 1)), data)

    def shuffle(key):
        perm = jax.random.permutation(key, steps)
        sh = jax.tree.map(lambda x: x[perm], big)
        return sh[0].sum()

    dt_s = timeit(jax.jit(shuffle), jax.random.key(5))
    print(f"dataset shuffle [n={steps}]: {dt_s*1e3:8.1f} ms  (x{args.epochs})")


if __name__ == "__main__":
    main()
