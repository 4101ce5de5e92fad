"""e1/e2 conflict-matrix build + fixpoint variants at config D shape
(B=4096, N=128): the moves-minus-one-pass gap is 0.45 ms; how much is
the [N, N] build/pack, and which packing is cheapest?

Variants (same fixpoint result, asserted):
  u32_pack  — production: bool [N, N] -> u32 [N, 4] via x*POW32 reduce
              (the widening intermediate is 4x the bool size)
  u8_pack   — bool -> u8 [N, 16]: widening intermediate stays byte-sized
  bool_keep — no packing: passes reduce the bool matrices directly
Each runs the same while_loop to fixpoint on identical synthetic
conflict structure (chains of follow dependencies).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

STEPS = 256
B, N, P = 4096, 128, 74


def synth(key):
    """Synthetic des/cur with realistic conflict density (~maze traffic)."""
    k1, k2 = jax.random.split(key)
    cur = jax.random.randint(k1, (B, N), 0, P * P // 8, dtype=jnp.int32)
    step = jax.random.randint(k2, (B, N), -1, 2, dtype=jnp.int32)
    des = cur + step
    return cur, des, des != cur


def fix_u32(cur, des, moving):
    from pogema_tpu.core.collisions import _eq, _pack_bits

    n = cur.shape[0]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    earlier = idx[None, :] < idx[:, None]
    toc = _eq(des, cur)
    m0 = moving & ~jnp.any(toc & later, axis=1)
    e1 = _pack_bits(_eq(des, des) & earlier)
    e2 = _pack_bits(toc & earlier)

    def body(c):
        m, _ = c
        mp = _pack_bits(m)[None, :]
        return m0 & ~jnp.any(((e1 & mp) | (e2 & ~mp)) != 0, -1), m

    def cond(c):
        m, prev = c
        return jnp.any(m != prev)

    m, _ = lax.while_loop(cond, body, (m0, jnp.zeros_like(m0) | ~m0))
    return m


def _pack8(x):
    n = x.shape[-1]
    pad = (-n) % 8
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xw = x.reshape(*x.shape[:-1], -1, 8)
    powers = jnp.left_shift(jnp.uint8(1), jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(xw.astype(jnp.uint8) * powers, axis=-1, dtype=jnp.uint8)


def fix_u8(cur, des, moving):
    from pogema_tpu.core.collisions import _eq

    n = cur.shape[0]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    earlier = idx[None, :] < idx[:, None]
    toc = _eq(des, cur)
    m0 = moving & ~jnp.any(toc & later, axis=1)
    e1 = _pack8(_eq(des, des) & earlier)
    e2 = _pack8(toc & earlier)

    def body(c):
        m, _ = c
        mp = _pack8(m)[None, :]
        return m0 & ~jnp.any(((e1 & mp) | (e2 & ~mp)) != 0, -1), m

    def cond(c):
        m, prev = c
        return jnp.any(m != prev)

    m, _ = lax.while_loop(cond, body, (m0, jnp.zeros_like(m0) | ~m0))
    return m


def fix_bool(cur, des, moving):
    from pogema_tpu.core.collisions import _eq

    n = cur.shape[0]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    earlier = idx[None, :] < idx[:, None]
    toc = _eq(des, cur)
    m0 = moving & ~jnp.any(toc & later, axis=1)
    e1 = _eq(des, des) & earlier
    e2 = toc & earlier

    def body(c):
        m, _ = c
        blocked = jnp.any((e1 & m[None, :]) | (e2 & ~m[None, :]), axis=1)
        return m0 & ~blocked, m

    def cond(c):
        m, prev = c
        return jnp.any(m != prev)

    m, _ = lax.while_loop(cond, body, (m0, jnp.zeros_like(m0) | ~m0))
    return m


def bench(name, fn):
    vf = jax.vmap(fn)
    cur0, des0, mov0 = synth(jax.random.key(0))
    ref = np.asarray(jax.jit(jax.vmap(fix_u32))(cur0, des0, mov0))
    out = np.asarray(jax.jit(vf)(cur0, des0, mov0))
    assert np.array_equal(out, ref), name

    def body(c, _):
        key, = c
        key, ks = jax.random.split(key)
        cur, des, mov = synth(ks)
        return (key,), vf(cur, des, mov).sum()

    @jax.jit
    def run(key):
        _, out = lax.scan(body, (key,), None, length=STEPS)
        return out.sum()

    out = run(jax.random.key(1))
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(jax.random.key(1))
        int(out)
        dt = min(dt, time.perf_counter() - t0)
    print(json.dumps({"variant": name,
                      "us_per_step": round(dt / STEPS * 1e6, 1)}), flush=True)


bench("u32_pack", fix_u32)
bench("u8_pack", fix_u8)
bench("bool_keep", fix_bool)
