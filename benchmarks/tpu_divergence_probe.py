"""Bisect the TPU-vs-CPU reset divergence at scale (test_tpu_scale failures).

Runs each stage of the vmapped reset pipeline at the failing shape
(B=1024, size=128, N=32) on BOTH backends and reports the first stage
whose output differs bit-wise. Stages:

  1. per-env keys (random.split)
  2. obstacle maps (bernoulli_obstacles + pad_grid)
  3. connected components (cummax flood fill)
  4. eligibility mask (multi_cell_component)
  5. agent scores (uniform) + top_k agent cells
  6. target cells (argmax over masked u32 bits, fori_loop)
  7. full reset_one (the production path incl. retry while_loop)

Usage: JAX_PLATFORMS=axon,cpu python benchmarks/tpu_divergence_probe.py
(wrap in `timeout 420` — the tunnel hangs ~1 in 4 runs).
"""

import faulthandler
import sys

faulthandler.dump_traceback_later(400, exit=True)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from pogema_tpu import GridConfig
from pogema_tpu.core import generator as G

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 128
N = int(sys.argv[3]) if len(sys.argv) > 3 else 32

cfg = GridConfig(seed=0, size=SIZE, num_agents=N, obs_radius=5,
                 max_episode_steps=128, on_target="finish").to_static()

cpu = jax.local_devices(backend="cpu")[0]
dev = jax.devices()[0]
print(f"default device: {dev}, host: {cpu}", flush=True)


def stage_all(key):
    """First attempt of generate_env, stage by stage, for ONE env."""
    k, sub = jax.random.split(key)
    k_map, k_place = jax.random.split(sub)
    grid = G.pad_grid(cfg, G.bernoulli_obstacles(cfg, k_map))
    comps = G.connected_components(grid)
    elig = G.multi_cell_component(comps, cfg.padded_size)
    big = cfg.padded_size * cfg.padded_size
    k_agents, k_targets = jax.random.split(k_place)
    scores = jnp.where(elig, jax.random.uniform(k_agents, (big,)), -1.0)
    top_scores, agent_cells = jax.lax.top_k(scores, cfg.num_agents)
    a_cells, t_cells, ok = G.place_agents_and_targets(cfg, k_place, comps)
    return {
        "grid": grid,
        "comps": comps,
        "elig": elig,
        "scores": scores,
        "top_scores": top_scores,
        "agent_cells": agent_cells,
        "t_cells": t_cells,
        "ok": ok,
    }


@jax.jit
def run(key):
    keys = jax.random.split(key, B)
    return jax.vmap(stage_all)(keys)


def fetch(tree):
    return jax.tree.map(np.asarray, tree)


key_data = np.asarray(jax.random.key_data(jax.device_put(jax.random.key(3), cpu)))

print("running on accelerator...", flush=True)
out_dev = fetch(run(jax.device_put(jax.random.wrap_key_data(jnp.asarray(key_data)), dev)))
print("running on host...", flush=True)
with jax.default_device(cpu):
    out_cpu = fetch(run(jax.random.wrap_key_data(jax.device_put(jnp.asarray(key_data), cpu))))

for name in ["grid", "comps", "elig", "scores", "top_scores", "agent_cells",
             "t_cells", "ok"]:
    a, b = out_dev[name], out_cpu[name]
    same = np.array_equal(a, b)
    print(f"stage {name:12s} equal={same}", flush=True)
    if not same:
        if a.ndim >= 1 and a.shape[0] == B:
            bad = np.nonzero(
                (a != b).reshape(B, -1).any(axis=1))[0]
            print(f"  diverging envs: {bad[:10].tolist()} (n={len(bad)})")
            e = int(bad[0])
            d = np.nonzero((a[e] != b[e]).reshape(-1))[0]
            print(f"  env {e}: first diffs at flat idx {d[:10].tolist()} "
                  f"(n={len(d)})")
            flat_a, flat_b = a[e].reshape(-1), b[e].reshape(-1)
            for i in d[:5]:
                print(f"    idx {i}: dev={flat_a[i]!r} cpu={flat_b[i]!r}")
        break
else:
    print("ALL STAGES EQUAL — divergence must be in retry loop / reset_one")
    # Stage 7: the production reset path
    from pogema_tpu import PogemaCore

    gcfg = GridConfig(seed=0, size=SIZE, num_agents=N, obs_radius=5,
                      max_episode_steps=128, on_target="finish")
    core = PogemaCore(gcfg, num_envs=B, device="default")
    st_dev, _ = core.reset(core.make_key(3))
    with jax.default_device(cpu):
        core_c = PogemaCore(gcfg, num_envs=B, device="cpu")
        st_cpu, _ = core_c.reset(core_c.make_key(3))
    for leaf in ("agents_xy", "targets_xy", "placement_ok"):
        a = np.asarray(getattr(st_dev, leaf))
        b = np.asarray(getattr(st_cpu, leaf))
        same = np.array_equal(a, b)
        print(f"reset_one {leaf:14s} equal={same}", flush=True)
        if not same:
            bad = np.nonzero((a != b).reshape(B, -1).any(axis=1))[0]
            print(f"  diverging envs: {bad[:10].tolist()} (n={len(bad)})")
print("done", flush=True)
