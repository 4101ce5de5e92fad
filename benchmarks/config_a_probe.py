"""Config A (B=1, N=1) latency decomposition: where do the ~50 us/step go?

Stages (all 4096-step scans, best of 3, forced scalar fetch):
  full      — step_auto (step + metrics + cached auto-reset), as benched
  bare      — step_one only (no auto-reset, no metrics)
  moves     — collision-resolved movement only
  rng       — just the per-step action sampling
Prints one JSON line per stage with us/step.
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

STEPS = 4096

cfg = GridConfig(seed=0, size=8, density=0.3, num_agents=1, obs_radius=5,
                 max_episode_steps=128)
core = PogemaCore(cfg, num_envs=1)
scfg = core.cfg
state, _ = core.reset(jax.random.key(0))
step_auto = core._make_step_auto(with_obs=False)


def bench(name, make_body, carry):
    @jax.jit
    def run(carry):
        def one(c, _):
            return make_body(c)

        c, out = lax.scan(one, carry, None, length=STEPS)
        return jax.tree.map(lambda x: x.sum(), out)

    out = run(carry)
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(carry)
        float(jax.tree.leaves(out)[0])
        dt = min(dt, time.perf_counter() - t0)
    print(json.dumps({"stage": name, "us_per_step": round(dt / STEPS * 1e6, 1),
                      "total_ms": round(dt * 1e3, 1)}), flush=True)


def act(key):
    key, k = jax.random.split(key)
    return key, jax.random.randint(k, (1, 1), 0, 5, dtype=jnp.int32)


def full_body(c):
    s, key = c
    key, a = act(key)
    ns, _, res, _, _ = step_auto(s, state, a)
    return (ns, key), res.rewards.sum()


def bare_body(c):
    s, key = c
    key, a = act(key)
    ns, res = step_mod.step_one(scfg, s, a[0])
    # keep step_count bounded so truncation logic stays realistic
    ns = ns.replace(step_count=ns.step_count % 128)
    return (ns, key), res.rewards.sum()


def moves_body(c):
    xy, key = c
    key, a = act(key)
    nxy = collisions.resolve_moves(
        scfg, state.obstacles[0], xy, jnp.ones(1, bool), a[0]
    )
    return (nxy, key), nxy.sum()


def rng_body(c):
    key, = c
    key, a = act(key)
    return (key,), a.sum()


s0 = jax.tree.map(lambda x: x[0], state)
bench("full", full_body, (state, jax.random.key(1)))
bench("bare", bare_body, (s0, jax.random.key(1)))
bench("moves", moves_body, (s0.agents_xy, jax.random.key(1)))
bench("rng", rng_body, (jax.random.key(1),))
