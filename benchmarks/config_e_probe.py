"""Config E single-chip memory probe: which phase (reset vs step scan)
stops fitting as the env count rises past the 2048 clamp?

Reset is OFF the hot path — if only reset's flood-fill/placement
intermediates exceed HBM, resetting in chunks (sequential half-batches)
unlocks larger step-scan batches and a higher config E number.

Usage:
  timeout 420 python benchmarks/config_e_probe.py --envs 4096 --phase reset
  timeout 420 python benchmarks/config_e_probe.py --envs 4096 --phase step --chunks 2
"""

import argparse
import faulthandler
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

faulthandler.dump_traceback_later(400, exit=True)


def mem(tag):
    try:
        s = jax.local_devices()[0].memory_stats()
        print(f"[{tag}] bytes_in_use={s.get('bytes_in_use', 0)/2**30:.2f} GiB "
              f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f} GiB")
    except Exception as e:  # tunneled backend may not expose stats
        print(f"[{tag}] memory_stats unavailable: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--phase", choices=["reset", "step", "both"], default="both")
    ap.add_argument("--chunks", type=int, default=1,
                    help="reset in this many sequential half-batches")
    ap.add_argument("--steps", type=int, default=256)
    args = ap.parse_args()

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.maps import mixed_pool

    cfg = GridConfig(seed=0, size=128, num_agents=256, obs_radius=5,
                     density=0.3, max_episode_steps=128)
    bank = mixed_pool(128, 64)

    B = args.envs
    mem("start")
    if args.chunks > 1:
        assert B % args.chunks == 0
        bc = B // args.chunks
        core_c = PogemaCore(cfg, num_envs=bc, map_bank=bank)
        t0 = time.perf_counter()
        parts = []
        for i in range(args.chunks):
            s, _ = core_c.reset(core_c.make_key(i), with_obs=False)
            # Force materialization + free the reset transients. A real
            # scalar fetch, NOT block_until_ready: the tunneled backend
            # does not synchronize on block_until_ready (CLAUDE.md), so
            # chunks would otherwise overlap their reset transients.
            int(np.asarray(s.agents_xy[0, 0, 0]))
            parts.append(s)
        state = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        int(np.asarray(state.agents_xy[0, 0, 0]))  # real fetch (tunnel)
        print(f"chunked reset ({args.chunks}x{bc}): "
              f"{time.perf_counter()-t0:.1f}s")
        del parts
        core = PogemaCore(cfg, num_envs=B, map_bank=bank)
    else:
        core = PogemaCore(cfg, num_envs=B, map_bank=bank)
        t0 = time.perf_counter()
        state, _ = core.reset(core.make_key(0), with_obs=False)
        int(np.asarray(state.agents_xy[0, 0, 0]))
        print(f"full reset: {time.perf_counter()-t0:.1f}s")
    mem("post-reset")
    if args.phase == "reset":
        print("RESET OK")
        return

    step_auto = core._make_step_auto()

    def run(state, initial_state, key, num_steps):
        def one(carry, _):
            s, k = carry
            k, kk = jax.random.split(k)
            a = jax.random.randint(kk, (B, 256), 0, 5, dtype=jnp.int32)
            ns, _, res, _, _ = step_auto(s, initial_state, a)
            return (ns, k), res.rewards.sum()

        (s, _), rews = lax.scan(one, (state, key), None, length=num_steps)
        return s, rews.sum()

    run_jit = jax.jit(run, static_argnums=(3,))
    t0 = time.perf_counter()
    s2, r = run_jit(state, state, core.make_key(1), args.steps)
    float(r)
    print(f"step scan compile+run: {time.perf_counter()-t0:.1f}s")
    mem("post-step")
    best = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        _, r = run_jit(s2, state, core.make_key(2 + trial), args.steps)
        float(r)
        best = min(best, time.perf_counter() - t0)
    rate = B * args.steps / best
    print(f"STEP OK: {rate:,.0f} env-steps/s (best of 3, {args.steps} steps)")


if __name__ == "__main__":
    main()
