"""Bisect the target-placement TPU-vs-CPU divergence at scale.

tpu_divergence_probe showed t_cells differing in ~27/1024 envs (one agent
slot each) AFTER the flood-fill fix. This instruments the
place_agents_and_targets fori_loop per iteration and records, per agent i:

  c           chosen cell (argmax)
  gmax        sc[c] (the winning masked random value)
  mask_pop    popcount of the eligibility mask
  g_xor       XOR-checksum of the raw u32 random bits (RNG divergence?)
  used_pop    popcount of `used` AFTER the update (scatter divergence?)

Comparing these TPU vs CPU pins which sub-op diverges first.

Usage: timeout 500 python benchmarks/placement_probe.py [B]
"""

import sys

import faulthandler

faulthandler.dump_traceback_later(480, exit=True)

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")
from pogema_tpu import GridConfig
from pogema_tpu.core import generator as G

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
SIZE, N = 128, 32
cfg = GridConfig(seed=0, size=SIZE, num_agents=N, obs_radius=5,
                 max_episode_steps=128, on_target="finish").to_static()
cpu = jax.local_devices(backend="cpu")[0]


def placement_traced(key):
    """Mirror of place_agents_and_targets with per-iteration outputs."""
    k, sub = jax.random.split(key)
    k_map, k_place = jax.random.split(sub)
    grid = G.pad_grid(cfg, G.bernoulli_obstacles(cfg, k_map))
    comps = G.connected_components(grid)

    p = cfg.padded_size
    n = cfg.num_agents
    big = p * p
    k_agents, k_targets = jax.random.split(k_place)

    eligible = G.multi_cell_component(comps, p)
    scores = jnp.where(eligible, jax.random.uniform(k_agents, (big,)), -1.0)
    top_scores, agent_cells = lax.top_k(scores, n)
    agent_cells = agent_cells.astype(jnp.int32)

    free = comps < big
    cell_ids = jnp.arange(big, dtype=jnp.int32)

    def body(carry, i):
        used, = carry,
        comp = comps[agent_cells[i]]
        mask = free & (comps == comp) & ~used & (cell_ids != agent_cells[i])
        g = jax.random.bits(jax.random.fold_in(k_targets, i), (big,))
        sc = jnp.where(mask, g, jnp.uint32(0))
        c = jnp.argmax(sc).astype(jnp.int32)
        used = used.at[c].set(True)
        rec = {
            "c": c,
            "gmax": sc[c],
            "mask_pop": mask.sum().astype(jnp.int32),
            "g_xor": jax.lax.reduce(g, jnp.uint32(0),
                                    jnp.bitwise_xor, (0,)),
            "used_pop": used.sum().astype(jnp.int32),
            "comp": comp,
        }
        return used, rec

    _, recs = lax.scan(body, jnp.zeros(big, bool), jnp.arange(n))
    recs["agent_cells"] = agent_cells
    return recs


@jax.jit
def run(key):
    keys = jax.random.split(key, B)
    return jax.vmap(placement_traced)(keys)


key_data = np.asarray(
    jax.random.key_data(jax.device_put(jax.random.key(3), cpu)))
print("accelerator...", flush=True)
out_dev = jax.tree.map(np.asarray,
                       run(jax.device_put(jax.random.wrap_key_data(jnp.asarray(key_data)))))
print("host...", flush=True)
with jax.default_device(cpu):
    out_cpu = jax.tree.map(
        np.asarray,
        run(jax.random.wrap_key_data(jax.device_put(jnp.asarray(key_data), cpu))))

c_d, c_c = out_dev["c"], out_cpu["c"]  # [B, N]
bad = np.nonzero((c_d != c_c).any(axis=1))[0]
print(f"diverging envs: {len(bad)} / {B}")
for e in bad[:5]:
    i = int(np.nonzero(c_d[e] != c_c[e])[0][0])
    print(f"env {e} first divergent agent i={i}")
    for f in ["agent_cells", "comp", "mask_pop", "g_xor", "gmax", "c",
              "used_pop"]:
        a = out_dev[f][e]
        b = out_cpu[f][e]
        ai = a[i] if f != "agent_cells" else a[i]
        bi = b[i]
        pre_eq = bool(np.array_equal(a[:i], b[:i]))
        print(f"  {f:12s} dev={ai} cpu={bi} equal_before_i={pre_eq}")
print("done", flush=True)
