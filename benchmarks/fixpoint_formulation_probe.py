"""resolve_priority formulations at config C/D scale.

Finding (fixpoint_layout_probe.py): the Jacobi passes themselves are
~1 us each — the moves-minus-one-pass gap (0.14 ms at C, 0.43 at D) is
the *construction + bit-packing of the loop-invariant [N, N] matrices*
(the bool->u32 widening materializes 4x the bool size) plus while-loop
cond stalls.

Variants (identical results, asserted):
  v_packed     — current production code (cache + pack e1/e2, packed passes)
  v_bool_cache — cache bool [N, N] matrices, passes reduce bool (no packing)
  v_recompute  — cache NOTHING: each pass recomputes the compare from the
                 [N] cell vectors; XLA fuses compare+mask+reduce without
                 HBM-materializing [N, N]
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

from pogema_tpu.core import collisions

STEPS = 256


def propose_fields(key, b, n, p):
    k1, k2 = jax.random.split(key)
    cur = jax.random.randint(k1, (b, n), 0, p * p, dtype=jnp.int32)
    deltas = jax.random.randint(k2, (b, n), -1, 2, dtype=jnp.int32)
    des = cur + deltas  # synthetic but adversarially overlapping ids
    moving = des != cur
    return cur, des, moving


def v_packed(cur_cells, des_cells, moving):
    n = cur_cells.shape[0]
    active = jnp.ones(n, bool)
    tgt_on_cur = collisions._eq(des_cells, cur_cells)
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    earlier_active = (idx[None, :] < idx[:, None]) & active[None, :]
    m0 = moving & ~jnp.any(tgt_on_cur & later, axis=1)
    e1 = collisions._pack_bits(collisions._eq(des_cells, des_cells) & earlier_active)
    e2 = collisions._pack_bits(tgt_on_cur & earlier_active)

    def body(carry):
        m, _ = carry
        mp = collisions._pack_bits(m)[None, :]
        acc = (e1 & mp) | (e2 & ~mp)
        return m0 & ~jnp.any(acc != 0, axis=-1), m

    def cond(carry):
        m, prev = carry
        return jnp.any(m != prev)

    m, _ = lax.while_loop(cond, body, (m0, jnp.zeros_like(m0) | ~m0))
    return m


def v_bool_cache(cur_cells, des_cells, moving):
    n = cur_cells.shape[0]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    earlier = idx[None, :] < idx[:, None]
    tgt_on_cur = collisions._eq(des_cells, cur_cells)
    m0 = moving & ~jnp.any(tgt_on_cur & later, axis=1)
    e1 = collisions._eq(des_cells, des_cells) & earlier
    e2 = tgt_on_cur & earlier

    def body(carry):
        m, _ = carry
        blocked = jnp.any((e1 & m[None, :]) | (e2 & ~m[None, :]), axis=1)
        return m0 & ~blocked, m

    def cond(carry):
        m, prev = carry
        return jnp.any(m != prev)

    m, _ = lax.while_loop(cond, body, (m0, jnp.zeros_like(m0) | ~m0))
    return m


def v_recompute(cur_cells, des_cells, moving):
    n = cur_cells.shape[0]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    earlier = idx[None, :] < idx[:, None]
    m0 = moving & ~jnp.any(
        collisions._eq(des_cells, cur_cells) & later, axis=1)

    def body(carry):
        m, _ = carry
        # f_j = des_j if m_j else cur_j, recomputed per pass — [N] data,
        # the [N, N] compare lives only inside the fused reduction.
        f = jnp.where(m, des_cells, cur_cells)
        blocked = jnp.any(
            (des_cells[:, None] == f[None, :]) & earlier, axis=1)
        return m0 & ~blocked, m

    def cond(carry):
        m, prev = carry
        return jnp.any(m != prev)

    m, _ = lax.while_loop(cond, body, (m0, jnp.zeros_like(m0) | ~m0))
    return m


VARIANTS = [("v_packed", v_packed), ("v_bool_cache", v_bool_cache),
            ("v_recompute", v_recompute)]


def bench(tag, b, n, p):
    cur0, des0, mov0 = propose_fields(jax.random.key(0), b, n, p)
    # correctness first
    ref = None
    for name, fn in VARIANTS:
        out = np.asarray(jax.jit(jax.vmap(fn))(cur0, des0, mov0))
        if ref is None:
            ref = out
        else:
            assert np.array_equal(out, ref), (tag, name)

    for name, fn in VARIANTS:
        vf = jax.vmap(fn)

        def body(c, _):
            key, = c
            key, ks = jax.random.split(key)
            cur, des, mov = propose_fields(ks, b, n, p)
            m = vf(cur, des, mov)
            return (key,), m.sum()

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
        print(json.dumps({"shape": tag, "variant": name,
                          "us_per_step": round(dt / STEPS * 1e6, 1)}),
              flush=True)


bench("C(4096x64)", 4096, 64, 74)
bench("D(4096x128)", 4096, 128, 74)
