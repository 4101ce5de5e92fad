"""Round-4 probe of the priority-fixpoint setup (VERDICT r3 item 7).

Post-peel, the config-C priority-vs-block_both gap is attributed to the
loop-invariant conflict-matrix build + residual peeled passes
(RESULTS.md decomposition). Two untried formulations of
``_priority_fixpoint_setup``:

* ``merged``: E1/E2 concatenated into ONE [N, 2W] word array so each
  Jacobi pass is a single AND + single any-reduce (baseline does two
  masked ANDs + an OR before the reduce).
* ``staticfold``: earlier-indexed agents that never move (``~moving``)
  block statically (their f_j == c_j for every m) — fold them into m0
  and strip E1/E2 to mover columns. Shrinks the dynamic matrices'
  populated fraction; same shapes.
* ``both``: staticfold + merged.

Semantics-gated: each variant's 2048-step production rollout must equal
the baseline bit-for-bit before it is timed (same PRNG stream).

Usage: python benchmarks/fixpoint_r4_probe.py [--steps 2048]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
from jax import lax

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.core import collisions
from pogema_tpu.core.collisions import _eq, _pack_bits


_BASELINE = collisions._priority_fixpoint_setup


def setup_merged(des_cells, cur_cells, active, moving):
    n = des_cells.shape[0]
    tgt_on_cur = _eq(des_cells, cur_cells) & active[None, :]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    m0 = moving & ~jnp.any(tgt_on_cur & later, axis=1)
    earlier_active = (idx[None, :] < idx[:, None]) & active[None, :]
    e1 = _pack_bits(_eq(des_cells, des_cells) & earlier_active)
    e2 = _pack_bits(tgt_on_cur & earlier_active)
    e12 = jnp.concatenate([e1, e2], axis=-1)  # [N, 2W]

    def one_pass(m):
        mp = _pack_bits(m)
        mp2 = jnp.concatenate([mp, ~mp])[None, :]
        blocked = jnp.any((e12 & mp2) != 0, axis=-1)
        return m0 & ~blocked

    return m0, one_pass


def setup_staticfold(des_cells, cur_cells, active, moving):
    n = des_cells.shape[0]
    tgt_on_cur = _eq(des_cells, cur_cells) & active[None, :]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    earlier_active = (idx[None, :] < idx[:, None]) & active[None, :]
    # static blockers: later-indexed still on my target at my turn, OR
    # earlier-indexed non-movers parked on my target forever
    static = later | (earlier_active & ~moving[None, :])
    m0 = moving & ~jnp.any(tgt_on_cur & static, axis=1)
    dyn = earlier_active & moving[None, :]
    e1 = _pack_bits(_eq(des_cells, des_cells) & dyn)
    e2 = _pack_bits(tgt_on_cur & dyn)

    def one_pass(m):
        mp = _pack_bits(m)[None, :]
        blocked = jnp.any(((e1 & mp) | (e2 & ~mp)) != 0, axis=-1)
        return m0 & ~blocked

    return m0, one_pass


def setup_both(des_cells, cur_cells, active, moving):
    n = des_cells.shape[0]
    tgt_on_cur = _eq(des_cells, cur_cells) & active[None, :]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    earlier_active = (idx[None, :] < idx[:, None]) & active[None, :]
    static = later | (earlier_active & ~moving[None, :])
    m0 = moving & ~jnp.any(tgt_on_cur & static, axis=1)
    dyn = earlier_active & moving[None, :]
    e12 = jnp.concatenate([
        _pack_bits(_eq(des_cells, des_cells) & dyn),
        _pack_bits(tgt_on_cur & dyn)], axis=-1)

    def one_pass(m):
        mp = _pack_bits(m)
        mp2 = jnp.concatenate([mp, ~mp])[None, :]
        blocked = jnp.any((e12 & mp2) != 0, axis=-1)
        return m0 & ~blocked

    return m0, one_pass


VARIANTS = {
    "baseline": _BASELINE,
    "merged": setup_merged,
    "staticfold": setup_staticfold,
    "both": setup_both,
}


def build(config, b):
    if config == "C":
        cfg = GridConfig(seed=0, size=64, density=0.3, num_agents=64,
                         obs_radius=5, max_episode_steps=128,
                         on_target="finish")
        core = PogemaCore(cfg, num_envs=b, maze=True)
    else:
        cfg = GridConfig(seed=0, size=64, density=0.3, num_agents=128,
                         obs_radius=5, max_episode_steps=128,
                         on_target="restart")
        core = PogemaCore(cfg, num_envs=b)
    state, _ = core.reset(jax.random.key(0), with_obs=False)
    return core, state


def make_run(core, b, n, steps):
    step_auto = core._make_step_auto(with_obs=False)

    @jax.jit
    def run(state, key):
        def body(c, _):
            s, k = c
            k, ka = jax.random.split(k)
            a = jax.random.randint(ka, (b, n), 0, 5, dtype=jnp.int32)
            ns, _, res, _, _ = step_auto(s, state, a)
            return (ns, k), res.rewards.sum()

        (s, _), rew = lax.scan(body, (state, key), None, length=steps)
        return rew.sum(), s.agents_xy.sum()

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--configs", default="C,D")
    args = ap.parse_args()

    for config in args.configs.split(","):
        core, state = build(config, args.envs)
        n = state.agents_xy.shape[1]
        ref = None
        for name, fn in VARIANTS.items():
            collisions._priority_fixpoint_setup = fn
            run = make_run(core, args.envs, n, args.steps)
            out = run(state, jax.random.key(1))
            got = (float(out[0]), int(out[1]))
            if ref is None:
                ref = got
            assert got == ref, (config, name, got, ref)
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(state, jax.random.key(1))
                float(out[0])
                dt = min(dt, time.perf_counter() - t0)
            print(json.dumps({
                "config": config, "variant": name,
                "ms_per_step": round(dt / args.steps * 1e3, 4),
                "env_steps_per_s": round(args.envs * args.steps / dt),
            }), flush=True)
        collisions._priority_fixpoint_setup = _BASELINE


if __name__ == "__main__":
    main()
