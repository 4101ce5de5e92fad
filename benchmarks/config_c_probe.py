"""Config C (4096 envs x 64 agents, 64x64 maze, finish) latency
decomposition — where do the 0.65 ms/step go?

Stages (256-step scans, best of 3, forced scalar fetch):
  full        — step_auto as benched (priority + finish + metrics + cached reset)
  bare        — step_one only
  moves       — collision-resolved movement only (priority fixpoint)
  moves_nofix — movement with the fixpoint capped to one pass
  propose     — obstacle validation only (one-hot point_lookup einsums)
  actions     — the random-action draw alone (scan overhead floor)
Prints one JSON line per stage (ms/step).
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
from pogema_tpu.core import collisions, step as step_mod

STEPS = 256
B, N = 4096, 64

cfg = GridConfig(seed=0, size=64, density=0.3, num_agents=N, obs_radius=5,
                 max_episode_steps=128, on_target="finish")
core = PogemaCore(cfg, num_envs=B, maze=True)
scfg = core.cfg
state, _ = core.reset(jax.random.key(0))
step_auto = core._make_step_auto()


def bench(name, body, carry):
    # `state` is passed as an explicit jit argument (never a closure:
    # closed-over device pytrees embed as program constants via a
    # device->host fetch that can hang the tunnel, and constants make
    # the timings unrepresentative of the production path — CLAUDE.md).
    @jax.jit
    def run(carry, state):
        c, out = lax.scan(lambda c, _: body(c, state), carry, None,
                          length=STEPS)
        return jax.tree.map(lambda x: x.sum(), out)

    out = run(carry, state)
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(carry, state)
        float(jax.tree.leaves(out)[0])
        dt = min(dt, time.perf_counter() - t0)
    print(json.dumps({"stage": name, "ms_per_step": round(dt / STEPS * 1e3, 3),
                      "env_steps_per_s": round(B * STEPS / dt)}), flush=True)


def act(key):
    key, k = jax.random.split(key)
    return key, jax.random.randint(k, (B, N), 0, 5, dtype=jnp.int32)


def full_body(c, st):
    s, key = c
    key, a = act(key)
    ns, _, res, _, _ = step_auto(s, st, a)
    return (ns, key), res.rewards.sum()


def bare_body(c, st):
    s, key = c
    key, a = act(key)
    ns, res = jax.vmap(step_mod.step_one, in_axes=(None, 0, 0))(scfg, s, a)
    ns = ns.replace(step_count=ns.step_count % 128)
    return (ns, key), res.rewards.sum()


def moves_body(c, st):
    xy, key = c
    key, a = act(key)
    nxy = jax.vmap(
        lambda o, onib, x, act_: collisions.resolve_moves(
            scfg, o, x, jnp.ones(N, bool), act_, obstacles_nib=onib)
    )(st.obstacles, st.obstacle_nibbles, xy, a)
    return (nxy, key), nxy.sum()


def moves_nofix_body(c, st):
    xy, key = c
    key, a = act(key)

    def one_env(o, onib, x, act_):
        desired, des_cells, cur_cells, moving = collisions.propose(
            o, x, jnp.ones(N, bool), act_, onib)
        idx = jnp.arange(N)
        later = idx[None, :] > idx[:, None]
        tgt_on_cur = collisions._eq(des_cells, cur_cells)
        m0 = moving & ~jnp.any(tgt_on_cur & later, axis=1)
        return jnp.where(m0[:, None], desired, x)

    nxy = jax.vmap(one_env)(st.obstacles, st.obstacle_nibbles, xy, a)
    return (nxy, key), nxy.sum()


def propose_body(c, st):
    xy, key = c
    key, a = act(key)

    def one_env(o, onib, x, act_):
        desired, _, _, _ = collisions.propose(o, x, jnp.ones(N, bool), act_, onib)
        return desired

    nxy = jax.vmap(one_env)(st.obstacles, st.obstacle_nibbles, xy, a)
    return (nxy, key), nxy.sum()


def actions_body(c, st):
    key, = c
    key, a = act(key)
    return (key,), a.sum()


bench("full", full_body, (state, jax.random.key(1)))
bench("bare", bare_body, (state, jax.random.key(1)))
bench("moves", moves_body, (state.agents_xy, jax.random.key(1)))
bench("moves_nofix", moves_nofix_body, (state.agents_xy, jax.random.key(1)))
bench("propose", propose_body, (state.agents_xy, jax.random.key(1)))
bench("actions", actions_body, (jax.random.key(1),))
