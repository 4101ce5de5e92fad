"""Priority-fixpoint iteration statistics + unrolled-prefix variant
(config D shape: 4096 envs x 128 agents).

Stages:
  iters    — distribution of Jacobi iteration counts (max over batch per
             step, sampled over a 64-step scan)
  moves    — current resolver (while_loop from m0)
  moves_uK — K unrolled passes, then while_loop (no cond/dispatch cost
             for the common shallow chains)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.core import collisions

STEPS = 256
B, N = 4096, 128

cfg = GridConfig(seed=0, size=64, density=0.3, num_agents=N, obs_radius=5,
                 max_episode_steps=128, on_target="restart")
core = PogemaCore(cfg, num_envs=B)
scfg = core.cfg
state, _ = core.reset(jax.random.key(0))


def bench(name, body, carry, steps=STEPS):
    @jax.jit
    def run(carry):
        c, out = lax.scan(lambda c, _: body(c), carry, None, length=steps)
        return jax.tree.map(lambda x: x.sum(), out)

    out = run(carry)
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(carry)
        float(jax.tree.leaves(out)[0])
        dt = min(dt, time.perf_counter() - t0)
    print(json.dumps({"stage": name, "ms_per_step": round(dt / steps * 1e3, 3),
                      "env_steps_per_s": round(B * steps / dt)}), flush=True)


def act(key):
    key, k = jax.random.split(key)
    return key, jax.random.randint(k, (B, N), 0, 5, dtype=jnp.int32)


def resolve_counted(obstacles, agents_xy, active, actions):
    """resolve_priority with an iteration counter."""
    n = agents_xy.shape[0]
    desired, des_cells, cur_cells, moving = collisions.propose(
        obstacles, agents_xy, active, actions)
    tgt_on_cur = collisions._eq(des_cells, cur_cells) & active[None, :]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    earlier = idx[None, :] < idx[:, None]
    blocked_static = jnp.any(tgt_on_cur & later, axis=1)
    m0 = moving & ~blocked_static
    earlier_active = earlier & active[None, :]
    e1 = collisions._pack_bits(collisions._eq(des_cells, des_cells) & earlier_active)
    e2 = collisions._pack_bits(tgt_on_cur & earlier_active)

    def body(carry):
        m, _, it = carry
        mp = collisions._pack_bits(m)[None, :]
        acc = (e1 & mp) | (e2 & ~mp)
        blocked = jnp.any(acc != 0, axis=-1)
        return m0 & ~blocked, m, it + 1

    def cond(carry):
        m, prev, _ = carry
        return jnp.any(m != prev)

    m, _, iters = lax.while_loop(
        cond, body, (m0, jnp.zeros_like(m0) | ~m0, jnp.int32(0)))
    return jnp.where(m[:, None], desired, agents_xy), iters


def iters_body(c):
    xy, key = c
    key, a = act(key)
    nxy, iters = jax.vmap(
        lambda o, x, act_: resolve_counted(o, x, jnp.ones(N, bool), act_)
    )(state.obstacles, xy, a)
    return (nxy, key), iters.max()


@jax.jit
def iter_stats(xy, key):
    def one(c, _):
        return iters_body(c)

    _, maxes = lax.scan(one, (xy, key), None, length=64)
    return maxes


def make_unrolled(k_unroll):
    def resolve(obstacles, agents_xy, active, actions):
        n = agents_xy.shape[0]
        desired, des_cells, cur_cells, moving = collisions.propose(
            obstacles, agents_xy, active, actions)
        tgt_on_cur = collisions._eq(des_cells, cur_cells) & active[None, :]
        idx = jnp.arange(n)
        later = idx[None, :] > idx[:, None]
        earlier = idx[None, :] < idx[:, None]
        blocked_static = jnp.any(tgt_on_cur & later, axis=1)
        m0 = moving & ~blocked_static
        earlier_active = earlier & active[None, :]
        e1 = collisions._pack_bits(collisions._eq(des_cells, des_cells) & earlier_active)
        e2 = collisions._pack_bits(tgt_on_cur & earlier_active)

        def passes(m):
            mp = collisions._pack_bits(m)[None, :]
            acc = (e1 & mp) | (e2 & ~mp)
            blocked = jnp.any(acc != 0, axis=-1)
            return m0 & ~blocked

        prev = m0
        m = passes(m0)
        for _ in range(k_unroll - 1):
            prev = m
            m = passes(m)

        def body(carry):
            m, _ = carry
            return passes(m), m

        def cond(carry):
            m, prev = carry
            return jnp.any(m != prev)

        m, _ = lax.while_loop(cond, body, (m, prev))
        return jnp.where(m[:, None], desired, agents_xy)

    return resolve


def moves_body_with(resolver):
    def body(c):
        xy, key = c
        key, a = act(key)
        nxy = jax.vmap(
            lambda o, x, act_: resolver(o, x, jnp.ones(N, bool), act_)
        )(state.obstacles, xy, a)
        return (nxy, key), nxy.sum()

    return body


maxes = iter_stats(state.agents_xy, jax.random.key(5))
import numpy as np

m = np.asarray(maxes)
print(json.dumps({"stage": "iters", "mean_max": float(m.mean()),
                  "p50": int(np.percentile(m, 50)),
                  "max": int(m.max())}), flush=True)

bench("moves_cur", moves_body_with(collisions.resolve_priority),
      (state.agents_xy, jax.random.key(1)))
for k in (2, 4, 6):
    bench(f"moves_u{k}", moves_body_with(make_unrolled(k)),
          (state.agents_xy, jax.random.key(1)))
