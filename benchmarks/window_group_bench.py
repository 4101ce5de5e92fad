"""Settle the grouped stage-2 column-select question on hardware
(VERDICT r1 weak #3): times extract_windows at config-C shape for
group in {1, 2, 4, 8}. One JSON line per variant.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from pogema_tpu.ops.windows import extract_windows

B, N, SIZE, R = 4096, 64, 64, 5
P = SIZE + 2 * R
W = 2 * R + 1

rng = np.random.default_rng(0)
grids = jnp.asarray((rng.random((B, P, P)) < 0.3).astype(np.uint8))
xy = jnp.asarray(rng.integers(R, SIZE + R, size=(B, N, 2)).astype(np.int32))


def run(group):
    f = jax.jit(jax.vmap(lambda g, p: extract_windows(g, p, W, group=group)))
    out = f(grids, xy)
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(grids, xy)
        float(out.sum())
        dt = min(dt, time.perf_counter() - t0)
    return dt, out


base = None
for group in (1, 2, 4, 8):
    dt, out = run(group)
    if base is None:
        base, ref = dt, out
    else:
        assert jnp.array_equal(out, ref), f"group={group} diverges!"
    print(json.dumps({"group": group, "ms": round(dt * 1e3, 3),
                      "vs_group1": round(dt / base, 2)}), flush=True)
