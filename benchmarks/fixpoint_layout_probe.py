"""Jacobi fixpoint pass layout at config C (B=4096, N=64, W=2 words).

The bit-packed conflict matrices are [N, W] with W=2 as the minor dim —
2 of 128 lanes used, so every pass wastes ~98% of the VPU. Candidate:
keep the word axis in sublanes and agents in lanes ([W, N] per env).
Bodies run the same number of passes (fori_loop x4, no cond) so the
difference is pure per-pass cost.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

STEPS = 256
B, N = 4096, 64
W = (N + 31) // 32

key = jax.random.key(0)
k1, k2, k3 = jax.random.split(key, 3)
e1 = jax.random.bits(k1, (B, N, W), jnp.uint32)
e2 = jax.random.bits(k2, (B, N, W), jnp.uint32)
m0 = jax.random.bernoulli(k3, 0.5, (B, N))
POW = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))


def pack_last(x):  # bool[..., N] -> u32[..., W]
    xw = x.reshape(*x.shape[:-1], W, 32)
    return jnp.sum(xw.astype(jnp.uint32) * POW, axis=-1, dtype=jnp.uint32)


def v_current(e1, e2, m0):
    def pass_(m):
        mp = pack_last(m)[:, None, :]  # [B, 1, W]
        acc = (e1 & mp) | (e2 & ~mp)  # [B, N, W]
        return m0 & ~jnp.any(acc != 0, axis=-1)

    return lax.fori_loop(0, 4, lambda _, m: pass_(m), m0)


e1t = jnp.swapaxes(e1, -1, -2)  # [B, W, N]
e2t = jnp.swapaxes(e2, -1, -2)


def v_transposed(e1t, e2t, m0):
    def pass_(m):
        mp = pack_last(m)[:, :, None]  # [B, W, 1]
        acc = (e1t & mp) | (e2t & ~mp)  # [B, W, N]
        return m0 & ~jnp.any(acc != 0, axis=-2)

    return lax.fori_loop(0, 4, lambda _, m: pass_(m), m0)


def bench(name, fn, *ops):
    def body(m, _):
        m2 = fn(*ops, m)
        return m2 ^ (m2 & m), m2.sum()  # keep it live + varying

    @jax.jit
    def run(m):
        _, out = lax.scan(body, m, None, length=STEPS)
        return out.sum()

    out = run(m0)
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(m0)
        int(out)
        dt = min(dt, time.perf_counter() - t0)
    print(json.dumps({"variant": name,
                      "us_per_step_4passes": round(dt / STEPS * 1e6, 1)}),
          flush=True)


bench("current_NW", v_current, e1, e2)
bench("transposed_WN", v_transposed, e1t, e2t)
