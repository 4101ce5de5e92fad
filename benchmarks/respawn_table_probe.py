"""Probe: does build_respawn_table miscompile on TPU at large batch?

Context: component_sizes (segment_sum + label gather at [B, P*P]) returned
all-zeros on TPU at B>=1024 x 19k cells (see core/generator.py
multi_cell_component). build_respawn_table uses the same op family
(argsort / segment_min / segment_sum / gathers) at the same scale on
config D/E resets, so it may be silently corrupt at scale.

Checks, per stage, full-batch vs chunked(64) on the SAME backend plus
per-env invariants that need no reference computation:
  order  — argsort(components): must be a permutation of [0, P*P)
  rank   — scatter inverse of order: rank[order] == iota
  offset — segment_min: offset[label of order[i]] <= i
  count  — segment_sum: sum over present labels == P*P;
           count[big] == #obstacles
Prints one JSON line per (stage, scale).
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import faulthandler

faulthandler.dump_traceback_later(300, exit=True)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from pogema_tpu.core import generator
from pogema_tpu.grid_config import GridConfig

CHUNK = 64


def components_for(size, batch, seed):
    cfg = GridConfig(seed=0, size=size, density=0.3, num_agents=1, obs_radius=5)
    scfg = cfg.to_static()

    def one(key):
        grid = generator.pad_grid(scfg, generator.bernoulli_obstacles(scfg, key))
        return generator.connected_components(grid)

    keys = jax.random.split(jax.random.key(seed), batch)
    comps = []
    for i in range(0, batch, 256):  # chunked: components itself is not under test
        comps.append(jax.jit(jax.vmap(one))(keys[i : i + 256]))
    return jnp.concatenate(comps), scfg.padded_size


def table_full(comps):
    p = int(np.sqrt(comps.shape[-1]))
    return jax.jit(jax.vmap(lambda c: generator.build_respawn_table(c, p)))(comps)


def check(name, batch, size):
    comps, p = components_for(size, batch, seed=7)
    big = p * p
    comps_np = np.asarray(comps)

    full = {k: np.asarray(v) for k, v in table_full(comps).items()}
    chunks = []
    for i in range(0, batch, CHUNK):
        chunks.append({k: np.asarray(v) for k, v in table_full(comps[i : i + CHUNK]).items()})
    chunked = {k: np.concatenate([c[k] for c in chunks]) for k in full}

    report = {"probe": name, "batch": batch, "p": p}
    for k in ("cells", "offset", "count", "rank"):
        bad = int((full[k] != chunked[k]).any(axis=-1).sum())
        report[f"{k}_envs_mismatch_vs_chunked"] = bad

    # Reference-free invariants on the FULL-batch result.
    iota = np.arange(big)
    perm_bad = int(
        (np.sort(full["cells"], axis=-1) != iota[None, :]).any(axis=-1).sum()
    )
    rank_bad = 0
    off_bad = 0
    cnt_bad = 0
    for b in range(batch):
        order = full["cells"][b]
        if (full["rank"][b][order] != iota).any():
            rank_bad += 1
        labels = comps_np[b][order]
        if (full["offset"][b][labels] > iota).any():
            off_bad += 1
        n_obst = int((comps_np[b] == big).sum())
        present = np.unique(comps_np[b])
        if int(full["count"][b][present].sum()) != big or int(full["count"][b][big]) != n_obst:
            cnt_bad += 1
    report.update(
        cells_not_permutation=perm_bad,
        rank_not_inverse=rank_bad,
        offset_invariant_bad=off_bad,
        count_invariant_bad=cnt_bad,
        backend=jax.default_backend(),
    )
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    check("respawn_table", batch, size)
