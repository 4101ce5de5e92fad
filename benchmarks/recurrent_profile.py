"""Decompose recurrent-learner (GRU) train-step time — VERDICT r4 item 7.

The recurrent path trains every shipped checkpoint (D: 34k env-steps/s,
E: 12.5k) but never had the profiling treatment the fused feedforward
path got. Stages, at the training shapes of examples/train_ppo.py
--model recurrent:

  env_only   — the bare vectorized env scan (random actions)
  rollout    — policy in the loop (GRU cell + env step, T steps)
  mb_fwd     — ONE minibatch loss forward (T-step replay scan at B/mb)
  mb_grad    — ONE minibatch value_and_grad (what the update pays
               epochs*minibatches times)
  train_step — the full PPO train step
  embed_win  — embed_state_windows alone at rollout batch (the
               per-step window one-hot einsums; obstacle term is the
               known largest)
  embed_pre  — obstacle term via precomputed grid conv + one-hot row
               select (the fused learner's 'pre' strategy) at the same
               shape: decides whether a recurrent 'pre' variant is
               worth building.

Prints one JSON line per stage; env-steps/s uses T*B. Best-of-3 with a
forced scalar fetch (tunneled block_until_ready does not synchronize).

Usage:
  python benchmarks/recurrent_profile.py --envs 1024 --agents 128 \
      --size 64 --embed 128 --hidden 128 --minibatches 8   # D shape
  python benchmarks/recurrent_profile.py --envs 512 --agents 256 \
      --size 128 --rollout-steps 256 --embed 128 --hidden 128 \
      --minibatches 8                                      # E shape
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


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].sum())
        dt = min(dt, time.perf_counter() - t0)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--agents", type=int, default=128)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--rollout-steps", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--minibatches", type=int, default=8)
    ap.add_argument("--embed", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--tbatch", action="store_true",
                    help="also time the time-batched replay variant "
                         "(OOMs the compile at the E shape)")
    args = ap.parse_args()

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.models import init_recurrent_params
    from pogema_tpu.models.embed_actor_critic import embed_state_windows
    from pogema_tpu.parallel import (
        PPOConfig, init_recurrent_train_state, make_recurrent_train_step,
    )
    from pogema_tpu.parallel.rollout import make_recurrent_rollout_fn

    cfg = GridConfig(seed=0, size=args.size, num_agents=args.agents,
                     obs_radius=5, max_episode_steps=args.rollout_steps * 2,
                     on_target="restart")
    core = PogemaCore(cfg, num_envs=args.envs, auto_reset_mode="regen")
    model, params = init_recurrent_params(jax.random.key(0), 11,
                                          embed=args.embed,
                                          hidden=args.hidden)
    ppo = PPOConfig(rollout_steps=args.rollout_steps, epochs=args.epochs,
                    minibatches=args.minibatches)
    ts, tx = init_recurrent_train_state(core, model, params, ppo,
                                        jax.random.key(1))
    T, B, N = args.rollout_steps, args.envs, args.agents
    denom = T * B

    def emit(stage, dt, steps=denom):
        print(json.dumps({"stage": stage, "ms": round(dt * 1e3, 2),
                          "env_steps_per_s": round(steps / dt)}),
              flush=True)

    # 1. env-only scan
    step_auto = core._make_step_auto(with_obs=False)

    @jax.jit
    def env_only(state, initial_state, key):
        def one(carry, _):
            s, k = carry
            k, kk = jax.random.split(k)
            a = jax.random.randint(kk, (B, N), 0, 5, dtype=jnp.int32)
            ns, _, res, _, _ = step_auto(s, initial_state, a)
            return (ns, k), res.rewards.sum()

        (s, _), r = lax.scan(one, (state, key), None, length=T)
        return s.agents_xy.sum() + r.sum()

    emit("env_only", timeit(env_only, ts.env_state, ts.initial_env_state,
                            jax.random.key(2)))

    # 2. recurrent rollout (policy in the loop)
    mcls = type(model)

    def apply_cell(p, grids, axy, txy, active, h):
        return model.apply(p, grids, axy, txy, active, h,
                           method=mcls.step_from_state)

    rollout = make_recurrent_rollout_fn(core, apply_cell, T)

    @jax.jit
    def rollout_only(p, state, initial_state, h, key):
        s, h2, _, traj = rollout(p, state, initial_state, h, key)
        return s.agents_xy.sum() + traj.rewards.sum() + h2.sum()

    emit("rollout", timeit(rollout_only, ts.params, ts.env_state,
                           ts.initial_env_state, ts.h, jax.random.key(3)))

    # 3/4. one minibatch loss fwd / grad at replay shape [mb, T, ...]
    mb = B // args.minibatches
    train_step = make_recurrent_train_step(core, model, ppo, tx)

    def loss_fn(p, grids_mb, h0_mb, axy, txy, active, actions, olp, adv,
                targets, dones):
        def cell(h, xs):
            a, t, act, d = xs
            new_h, logits, values = apply_cell(p, grids_mb, a, t, act, h)
            new_h = jnp.where(d[..., None], 0, new_h)
            return new_h, (logits, values)

        _, (logits, values) = lax.scan(
            cell, h0_mb, (axy, txy, active, dones))
        from pogema_tpu.parallel.learner import _ppo_loss_terms

        loss, _ = _ppo_loss_terms(ppo, logits, values, actions, olp, adv,
                                  targets)
        return loss

    key = jax.random.key(4)
    grids_mb = ts.env_state.obstacles[:mb].astype(jnp.bfloat16)
    h0_mb = ts.h[:mb]
    axy = jnp.tile(ts.env_state.agents_xy[:mb][None], (T, 1, 1, 1))
    txy = jnp.tile(ts.env_state.targets_xy[:mb][None], (T, 1, 1, 1))
    active = jnp.ones((T, mb, N), bool)
    actions = jax.random.randint(key, (T, mb, N), 0, 5, dtype=jnp.int32)
    olp = jnp.zeros((T, mb, N), jnp.float32)
    adv = jax.random.normal(key, (T, mb, N), jnp.float32)
    targets = jnp.zeros((T, mb, N), jnp.float32)
    dones = jnp.zeros((T, mb, N), bool)
    mb_args = (ts.params, grids_mb, h0_mb, axy, txy, active, actions, olp,
               adv, targets, dones)

    emit("mb_fwd", timeit(jax.jit(loss_fn), *mb_args), steps=T * mb)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    emit("mb_grad", timeit(grad_fn, *mb_args), steps=T * mb)

    # 5. full train step
    emit("train_step", timeit(jax.jit(train_step), ts))

    # 6/7: per-step embedding cost, measured IN-SCAN over T steps (a
    # single dispatched op is swamped by the ~31 ms tunnel floor).
    # Positions vary per step (pre-sampled valid coords) so nothing
    # constant-folds.
    w, r = 11, 5
    p_pad = ts.env_state.obstacles.shape[-1]
    kxy = jax.random.randint(jax.random.key(5), (T, B, N, 2), r,
                             p_pad - r - 1, dtype=jnp.int32)

    @jax.jit
    def embed_win_scan(p, state, xys):
        def one(acc, xy):
            e = embed_state_windows(
                p["params"]["embed_kernel"], p["params"]["embed_bias"],
                jnp.bfloat16, w, state.obstacles, xy, xy, state.active)
            return acc + e.sum(), None

        acc, _ = lax.scan(one, jnp.float32(0), xys)
        return acc

    emit("embed_win_scan", timeit(embed_win_scan, ts.params, ts.env_state,
                                  kxy))

    # 'pre' strategy: conv ONCE per rollout + per-step one-hot row select
    @jax.jit
    def grid_conv(p, grids):
        k = p["params"]["embed_kernel"].astype(jnp.bfloat16)[0].reshape(
            w, w, 1, args.embed)
        g = grids.astype(jnp.bfloat16)[..., None]
        return jax.lax.conv_general_dilated(
            g, k, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    e_grid = jax.block_until_ready(grid_conv(ts.params,
                                             ts.env_state.obstacles))
    dt = timeit(grid_conv, ts.params, ts.env_state.obstacles)
    emit("grid_conv_once", dt, steps=B)

    sr, sc = e_grid.shape[1], e_grid.shape[2]
    s2 = sr * sc

    @jax.jit
    def obst_select_scan(e_grid, xys):
        eg = e_grid.reshape(B, s2, args.embed)

        def one(acc, xy):
            cell = (xy[..., 0] - r) * sc + (xy[..., 1] - r)  # [B, N]
            oh = (cell[..., None] == jnp.arange(s2, dtype=jnp.int32)
                  ).astype(jnp.bfloat16)
            out = jnp.einsum("bns,bsh->bnh", oh, eg,
                             preferred_element_type=jnp.float32)
            return acc + out.sum(), None

        acc, _ = lax.scan(one, jnp.float32(0), xys)
        return acc

    emit("obst_select_scan", timeit(obst_select_scan, e_grid, kxy))

    # 5b. time-batched replay loss: the embedding does not depend on the
    #     GRU carry, so compute e[T, mb, N, E] in ONE batched contraction
    #     (T folded into the batch) and scan only the GRU cell + head
    #     over T. Same math; tests the per-scan-step overhead share.
    def loss_fn_tbatch(p, grids_mb, h0_mb, axy, txy, active, actions, olp,
                       adv, targets, dones):
        pe = p["params"]
        Tm = axy.shape[0]
        g_rep = jnp.broadcast_to(grids_mb, (Tm, *grids_mb.shape)).reshape(
            Tm * mb, *grids_mb.shape[1:])
        e = embed_state_windows(
            pe["embed_kernel"], pe["embed_bias"], jnp.bfloat16, 11,
            g_rep, axy.reshape(Tm * mb, N, 2), txy.reshape(Tm * mb, N, 2),
            active.reshape(Tm * mb, N)).reshape(Tm, mb, N, -1)

        def cell(h, xs):
            e_t, d = xs
            new_h, logits, values = model.apply(p, h, e_t,
                                                method=mcls._finish)
            new_h = jnp.where(d[..., None], 0, new_h)
            return new_h, (logits, values)

        _, (logits, values) = lax.scan(cell, h0_mb, (e, dones))
        from pogema_tpu.parallel.learner import _ppo_loss_terms

        loss, _ = _ppo_loss_terms(ppo, logits, values, actions, olp, adv,
                                  targets)
        return loss

    # Gated: folding T into the embed batch multiplies the pairwise
    # one-hot transients by T — [T*mb, N, M, w] x2 is ~12 GB at the E
    # shape and the remote compile helper dies (HTTP 500). Measured
    # infeasible, kept for smaller shapes only.
    if args.tbatch:
        emit("mb_fwd_tbatch", timeit(jax.jit(loss_fn_tbatch), *mb_args),
             steps=T * mb)
        emit("mb_grad_tbatch",
             timeit(jax.jit(jax.value_and_grad(loss_fn_tbatch)), *mb_args),
             steps=T * mb)

    # 6b. occupancy-grid embedding variant in-scan (the candidate
    #     reformulation of the agents channel: occ grid + shared
    #     extraction instead of pairwise [B,N,M,w] factors).
    from pogema_tpu.models.embed_actor_critic import embed_state_windows_occ

    @jax.jit
    def embed_occ_scan(p, state, xys):
        def one(acc, xy):
            e = embed_state_windows_occ(
                p["params"]["embed_kernel"], p["params"]["embed_bias"],
                jnp.bfloat16, w, state.obstacles, xy, xy, state.active)
            return acc + e.sum(), None

        acc, _ = lax.scan(one, jnp.float32(0), xys)
        return acc

    emit("embed_occ_scan", timeit(embed_occ_scan, ts.params, ts.env_state,
                                  kxy))

    # 7b. FULL pre-style embedding in-scan: obstacle row-select out of
    #     e_grid + the fused agents+target flat-offset one-hot (the
    #     from_state_pre formulation) — the drop-in candidate for the
    #     recurrent cell.
    kernel_bf = params["params"]["embed_kernel"].astype(jnp.bfloat16)
    table = jnp.concatenate([kernel_bf[1], kernel_bf[2]], axis=0)
    w2 = w * w

    @jax.jit
    def embed_pre_scan(e_grid, xys, active):
        eg = e_grid.reshape(B, s2, args.embed)

        def one(acc, xy):
            cell = (xy[..., 0] - r) * sc + (xy[..., 1] - r)
            oh = (cell[..., None] == jnp.arange(s2, dtype=jnp.int32)
                  ).astype(jnp.bfloat16)
            e_obst = jnp.einsum("bns,bsh->bnh", oh, eg,
                                preferred_element_type=jnp.float32)
            dxy = xy[:, None, :, :] - xy[:, :, None, :] + r
            valid = ((dxy >= 0) & (dxy < w)).all(-1) & active[:, None, :]
            q_ag = dxy[..., 0] * w + dxy[..., 1]
            rel = jnp.clip(xy - xy, -r, r) + r  # target rel (dummy = self)
            q_tg = w2 + rel[..., 0] * w + rel[..., 1]
            q = jnp.concatenate([q_ag, q_tg[:, :, None]], axis=2)
            vmask = jnp.concatenate(
                [valid, jnp.ones(q_tg.shape + (1,), bool)], axis=2)
            oh2 = ((q[..., None] == jnp.arange(2 * w2, dtype=jnp.int32))
                   & vmask[..., None]).astype(jnp.bfloat16)
            e_rest = jnp.einsum("bnmq,qh->bnh", oh2, table,
                                preferred_element_type=jnp.float32)
            return acc + (e_obst + e_rest).sum(), None

        acc, _ = lax.scan(one, jnp.float32(0), xys)
        return acc

    emit("embed_pre_scan", timeit(embed_pre_scan, e_grid, kxy,
                                  ts.env_state.active))

    # 8. chunked-replay estimate: the same mb_grad but the T-axis split
    #    into chunks of 16 folded into the batch (truncated BPTT with
    #    stored chunk-start h). Uses zero h0 at chunk starts — timing
    #    only; semantics live in the learner once adopted.
    chunk = 16
    if T % chunk == 0:
        nch = T // chunk

        def fold(x):  # [T, mb, ...] -> [chunk, nch*mb, ...]
            return (x.reshape(nch, chunk, mb, *x.shape[2:])
                    .swapaxes(0, 1)
                    .reshape(chunk, nch * mb, *x.shape[2:]))

        grids_big = jnp.tile(grids_mb, (nch, 1, 1))
        h0_big = jnp.tile(h0_mb, (nch, 1, 1))
        fargs = (ts.params, grids_big, h0_big, fold(axy), fold(txy),
                 fold(active), fold(actions), fold(olp), fold(adv),
                 fold(targets), fold(dones))
        emit("mb_grad_chunk16", timeit(jax.jit(jax.value_and_grad(loss_fn)),
                                       *fargs), steps=T * mb)


if __name__ == "__main__":
    main()
