"""Bisect the connected_components TPU miscompile at [1024, 138, 138].

The bare lax.cummax primitive is CORRECT at this shape (cummax_probe.py),
but connected_components inside jit(vmap(...)) returns labels from later
segments (negative after decode). This probe runs successively smaller
pieces of the flood fill on identical inputs, TPU vs CPU:

  full_jit      connected_components as-is (inner @jax.jit under vmap)
  full_nojit    same body without the inner jit
  sweep1        one sweep (4 directional segmented scans), no while_loop
  row_fwd       single forward row scan (_segmented_min_scan reverse=False)
  row_bwd       single backward row scan (flip path)
  col_fwd       transpose + forward scan + transpose back

Usage: timeout 420 python benchmarks/floodfill_probe.py [B]
"""

import sys

import faulthandler

faulthandler.dump_traceback_later(400, exit=True)

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")
from pogema_tpu.core import generator as G

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
P = 138
BIG = P * P

cpu = jax.local_devices(backend="cpu")[0]
rng = np.random.default_rng(0)
grids = (rng.random((B, P, P)) < 0.3).astype(np.uint8)
# border obstacles like pad_grid
grids[:, :5, :] = 1
grids[:, -5:, :] = 1
grids[:, :, :5] = 1
grids[:, :, -5:] = 1


def initial_labels(grid):
    obstacle = grid.astype(bool)
    return jnp.where(
        obstacle, BIG, jnp.arange(BIG, dtype=jnp.int32).reshape(P, P)
    ).astype(jnp.int32)


def cc_nojit(grid):
    """connected_components body, no inner jit (mirror of generator.py)."""
    obstacle = grid.astype(bool)
    labels = initial_labels(grid)

    def sweep(lab):
        lab = G._segmented_min_scan(lab, obstacle, axis=1, reverse=False)
        lab = G._segmented_min_scan(lab, obstacle, axis=1, reverse=True)
        lab = G._segmented_min_scan(lab, obstacle, axis=0, reverse=False)
        return G._segmented_min_scan(lab, obstacle, axis=0, reverse=True)

    def cond(carry):
        lab, prev, it = carry
        return jnp.any(lab != prev) & (it < BIG)

    def body(carry):
        lab, _, it = carry
        return sweep(lab), lab, it + 1

    labels, _, _ = lax.while_loop(cond, body, (sweep(labels), labels, jnp.int32(0)))
    return jnp.where(obstacle, BIG, labels).reshape(-1)


def sweep1(grid):
    obstacle = grid.astype(bool)
    lab = initial_labels(grid)
    lab = G._segmented_min_scan(lab, obstacle, axis=1, reverse=False)
    lab = G._segmented_min_scan(lab, obstacle, axis=1, reverse=True)
    lab = G._segmented_min_scan(lab, obstacle, axis=0, reverse=False)
    return G._segmented_min_scan(lab, obstacle, axis=0, reverse=True)


def sweep1_flipped(grid):
    """The ROUND-1 formulation (flip/transpose around forward row scans) —
    kept as the miscompile repro: XLA:TPU fuses the four scans wrongly at
    batch >= ~1024 (labels leak across segment boundaries)."""
    obstacle = grid.astype(bool)

    def scan_fwd(vals, boundary):
        big = vals.size
        k = jnp.int32(big + 2)
        seg = jnp.cumsum(boundary.astype(jnp.int32), axis=-1)
        w = seg * k + (k - 1 - jnp.minimum(vals, k - 1))
        w = lax.cummax(w, axis=vals.ndim - 1)
        return jnp.minimum((k - 1) - (w - seg * k), big)

    def scan(vals, boundary, reverse):
        if not reverse:
            return scan_fwd(vals, boundary)
        f = lambda x: jnp.flip(x, axis=-1)
        return f(scan_fwd(f(vals), f(boundary)))

    lab = initial_labels(grid)
    lab = scan(lab, obstacle, reverse=False)
    lab = scan(lab, obstacle, reverse=True)
    lab_t = lab.T
    lab_t = scan(lab_t, obstacle.T, reverse=False)
    lab_t = scan(lab_t, obstacle.T, reverse=True)
    return lab_t.T


def row_fwd(grid):
    return G._segmented_min_scan(
        initial_labels(grid), grid.astype(bool), axis=1, reverse=False)


def row_bwd(grid):
    return G._segmented_min_scan(
        initial_labels(grid), grid.astype(bool), axis=1, reverse=True)


def col_fwd(grid):
    return G._segmented_min_scan(
        initial_labels(grid), grid.astype(bool), axis=0, reverse=False)


CASES = {
    "full_jit": G.connected_components,
    "full_nojit": cc_nojit,
    "sweep1": sweep1,
    "sweep1_flipped": sweep1_flipped,
    "row_fwd": row_fwd,
    "row_bwd": row_bwd,
    "col_fwd": col_fwd,
}

g_dev = jax.device_put(grids)
g_cpu = jax.device_put(grids, cpu)

for name, fn in CASES.items():
    f = jax.jit(jax.vmap(fn))
    a = np.asarray(f(g_dev))
    b = np.asarray(f(g_cpu))
    same = np.array_equal(a, b)
    extra = ""
    if not same:
        bad_env = np.nonzero((a != b).reshape(B, -1).any(axis=1))[0]
        n_neg = int((a < 0).sum())
        extra = f"  bad_envs={len(bad_env)} first={bad_env[0]} neg_labels={n_neg}"
    print(f"{name:10s} TPU==CPU: {same}{extra}", flush=True)
