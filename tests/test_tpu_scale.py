"""Scale-level TPU-vs-CPU equivalence (gated: POGEMA_TEST_TPU=1).

Why this exists: XLA:TPU miscompiled vmapped segment_sum + label gather
at B >= ~1024 x 19k cells (all-zero component sizes -> total placement
failure for config E) while being bit-correct at B=64 and on CPU. The
golden fixtures replay tiny configs, so a SCALE-dependent miscompile is
invisible to them; this suite reruns the reset/placement/respawn pipeline
at benchmark scale on the accelerator and demands bit-equality with host
XLA (the engine is integer-exact across backends by design —
docs/DESIGN.md "Determinism").

Run: POGEMA_TEST_TPU=1 python -m pytest tests/test_tpu_scale.py -q
(~2-4 min on the tunneled v5e; skipped otherwise).
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    not os.environ.get("POGEMA_TEST_TPU"),
    reason="needs the real TPU: POGEMA_TEST_TPU=1",
)


def _cpu_device():
    plats = jax.config.jax_platforms
    if plats and "cpu" not in plats.split(","):
        jax.config.update("jax_platforms", plats + ",cpu")
    return jax.local_devices(backend="cpu")[0]


@pytest.mark.parametrize(
    "batch,size,agents,on_target",
    [
        (1024, 128, 32, "finish"),   # config E grid scale (the miscompile shape)
        (2048, 64, 64, "restart"),   # config D: respawn table + queue at scale
    ],
)
def test_reset_scale_matches_cpu(batch, size, agents, on_target):
    from pogema_tpu import GridConfig, PogemaCore

    cfg = GridConfig(
        seed=0, size=size, num_agents=agents, obs_radius=5,
        max_episode_steps=128, on_target=on_target,
    )
    core = PogemaCore(cfg, num_envs=batch, device="default")
    state, _ = core.reset(core.make_key(3))

    cpu = _cpu_device()
    with jax.default_device(cpu):
        core_cpu = PogemaCore(cfg, num_envs=batch, device="cpu")
        state_cpu, _ = core_cpu.reset(core_cpu.make_key(3))

    for leaf in ("agents_xy", "targets_xy", "target_queue", "placement_ok"):
        dev = getattr(state, leaf)
        host = getattr(state_cpu, leaf)
        if dev is None:
            assert host is None
            continue
        np.testing.assert_array_equal(
            np.asarray(dev), np.asarray(host), err_msg=f"{leaf} diverged"
        )
    assert bool(np.asarray(state.placement_ok).all())


def test_step_scale_matches_cpu():
    """64 steps at config-C scale: agent positions / rewards bit-equal."""
    from pogema_tpu import GridConfig, PogemaCore

    cfg = GridConfig(seed=0, size=64, num_agents=64, obs_radius=5,
                     max_episode_steps=128)
    n_steps, batch = 64, 1024
    rng = np.random.default_rng(0)
    actions = rng.integers(0, 5, size=(n_steps, batch, 64)).astype(np.int32)

    def rollout(core):
        state, _ = core.reset(core.make_key(5))
        initial = state
        # One bulk H2D of all actions; per-step slicing stays on device
        # (per-step host transfers through the tunnel are hang-prone).
        acts = jax.device_put(actions)
        for t in range(n_steps):
            state, _, _, _, _ = core.step_autoreset(state, initial, acts[t])
        return np.asarray(state.agents_xy), np.asarray(state.goals_achieved)

    core = PogemaCore(cfg, num_envs=batch, device="default", maze=True)
    xy_dev, goals_dev = rollout(core)
    cpu = _cpu_device()
    with jax.default_device(cpu):
        core_cpu = PogemaCore(cfg, num_envs=batch, device="cpu", maze=True)
        xy_cpu, goals_cpu = rollout(core_cpu)

    np.testing.assert_array_equal(xy_dev, xy_cpu)
    np.testing.assert_array_equal(goals_dev, goals_cpu)


def test_lifelong_step_and_obs_scale_matches_cpu():
    """64 LifeLong steps at scale: exercises the respawn-queue READ path
    (head-pointer one-hot dot) + goals_achieved increments under vmap at
    B=1024 — a gather/scan composition the reset-only test never runs —
    and the obs one-hot einsum path (values are exact small integers in
    f32, so bit-equality is required, not approx)."""
    from pogema_tpu import GridConfig, PogemaCore

    cfg = GridConfig(seed=0, size=64, num_agents=64, obs_radius=5,
                     max_episode_steps=128, on_target="restart")
    n_steps, batch = 64, 1024
    rng = np.random.default_rng(7)
    actions = rng.integers(0, 5, size=(n_steps, batch, 64)).astype(np.int32)

    def rollout(core):
        state, _ = core.reset(core.make_key(11))
        initial = state
        acts = jax.device_put(actions)
        obs = None
        for t in range(n_steps):
            state, obs, _, _, _ = core.step_autoreset(state, initial, acts[t])
        # Fetch a bit-exact slice + an exact integer checksum of the rest
        # (full [1024,64,3,11,11] f32 through the tunnel is hang-prone).
        obs_head = np.asarray(obs[:32])
        obs_sum = int(np.asarray(jax.numpy.sum(obs.astype(jax.numpy.int32))))
        return (np.asarray(state.agents_xy), np.asarray(state.goals_achieved),
                obs_head, obs_sum)

    core = PogemaCore(cfg, num_envs=batch, device="default")
    xy_dev, goals_dev, obs_dev, sum_dev = rollout(core)
    cpu = _cpu_device()
    with jax.default_device(cpu):
        core_cpu = PogemaCore(cfg, num_envs=batch, device="cpu")
        xy_cpu, goals_cpu, obs_cpu, sum_cpu = rollout(core_cpu)

    np.testing.assert_array_equal(xy_dev, xy_cpu)
    np.testing.assert_array_equal(goals_dev, goals_cpu)
    np.testing.assert_array_equal(obs_dev, obs_cpu, err_msg="obs diverged")
    assert sum_dev == sum_cpu, f"obs checksum diverged: {sum_dev} != {sum_cpu}"
    assert goals_dev.sum() > 0  # respawn path actually exercised


def test_regen_autoreset_scale_matches_cpu():
    """64 steps with 'regen' auto-reset and a short time limit at
    B=1024: on-device map/placement REgeneration runs inside the
    step_auto cond under vmap — a different fusion context from the
    reset-only test, which is exactly where this miscompile family
    lives (each primitive can probe clean while the fused composition
    is wrong)."""
    from pogema_tpu import GridConfig, PogemaCore

    cfg = GridConfig(seed=0, size=32, num_agents=16, obs_radius=5,
                     max_episode_steps=16, on_target="finish")
    n_steps, batch = 64, 1024
    rng = np.random.default_rng(3)
    actions = rng.integers(0, 5, size=(n_steps, batch, 16)).astype(np.int32)

    def rollout(core):
        state, _ = core.reset(core.make_key(9))
        initial = state
        acts = jax.device_put(actions)
        for t in range(n_steps):
            state, _, _, _, _ = core.step_autoreset(state, initial, acts[t])
        return (np.asarray(state.agents_xy), np.asarray(state.obstacles),
                np.asarray(state.placement_ok))

    core = PogemaCore(cfg, num_envs=batch, device="default",
                      auto_reset_mode="regen")
    xy_dev, obst_dev, ok_dev = rollout(core)
    cpu = _cpu_device()
    with jax.default_device(cpu):
        core_cpu = PogemaCore(cfg, num_envs=batch, device="cpu",
                              auto_reset_mode="regen")
        xy_cpu, obst_cpu, ok_cpu = rollout(core_cpu)

    np.testing.assert_array_equal(xy_dev, xy_cpu)
    np.testing.assert_array_equal(obst_dev, obst_cpu,
                                  err_msg="regenerated maps diverged")
    np.testing.assert_array_equal(ok_dev, ok_cpu)
    assert ok_dev.all()


def test_fused_train_step_scale_matches_cpu():
    """The fused PPO train step at B=1024 x 64 agents, TPU vs CPU.

    The gradient path composes the same hazardous machinery the env
    paths earned this defense for (batched one-hot einsums and scans at
    scale — three real XLA:TPU miscompiles, docs/DESIGN.md "Hazards")
    plus grad + optimizer. Float matmuls can't be bit-equal across
    backends, so the policy is pinned deterministic: head_out.kernel=0,
    bias[action 2] = +1000 — categorical sampling can't overcome +1000
    logits, so every agent takes action 2 on both backends and the whole
    env trajectory INSIDE the fused rollout scan (collision fixpoint,
    respawn queue, metrics) must be BIT-equal after 2 train steps, while
    loss/grads/params — computed on identical data — must agree to
    float tolerance. A scale-only miscompile in sampling, stepping, GAE,
    minibatch permutation, loss, or grads breaks one of these.

    Runtime warning: the CPU half executes the 'pre'-path train step at
    B=1024 x 64 agents on a 64x64 map — ~6 min/step on a 4-core host
    (the [B,N,S^2] one-hot contraction is memory-bound there), so this
    test alone is ~15 min. Run it after learner-path changes, not in
    the routine TPU sweep."""
    import jax.numpy as jnp

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.models import init_embed_params
    from pogema_tpu.parallel import (
        PPOConfig, init_fused_train_state, make_fused_train_step,
    )

    cfg = GridConfig(seed=0, size=64, density=0.3, num_agents=64,
                     obs_radius=5, max_episode_steps=128,
                     on_target="restart")
    ppo = PPOConfig(rollout_steps=8, epochs=1, minibatches=2,
                    obstacle_path="pre")

    def pinned_params():
        _, params = init_embed_params(jax.random.key(0), cfg.obs_radius * 2 + 1,
                                      embed=32, hidden=32)
        head = params["params"]["head_out"]
        bias = np.zeros_like(np.asarray(head["bias"]))
        bias[2] = 1000.0  # action 2 = move down, always
        head["kernel"] = jnp.zeros_like(head["kernel"])
        head["bias"] = jnp.asarray(bias)
        return params

    def run(device):
        core = PogemaCore(cfg, num_envs=1024, device=device)
        model, _ = init_embed_params(jax.random.key(0), core.cfg.window,
                                     embed=32, hidden=32)
        ts, tx = init_fused_train_state(core, model, pinned_params(), ppo,
                                        jax.random.key(1))
        step = jax.jit(make_fused_train_step(core, model, ppo, tx))
        for _ in range(2):
            ts, stats = step(ts)
        leaves = {
            "agents_xy": np.asarray(ts.env_state.agents_xy),
            "goals_achieved": np.asarray(ts.env_state.goals_achieved),
            "step_count": np.asarray(ts.env_state.step_count),
        }
        sf = {k: float(v) for k, v in stats.items()}
        norms = {
            "/".join(p if isinstance(p, str) else p.key for p in path):
                float(jnp.mean(jnp.abs(leaf)))
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                ts.params)[0]
        }
        return leaves, sf, norms

    leaves_t, stats_t, norms_t = run("default")
    cpu = _cpu_device()
    with jax.default_device(cpu):
        leaves_c, stats_c, norms_c = run("cpu")

    for k in leaves_t:
        np.testing.assert_array_equal(leaves_t[k], leaves_c[k],
                                      err_msg=f"env leaf {k} diverged")
    assert leaves_t["goals_achieved"].sum() >= 0
    # With the pinned head the loss terms are noise-level (~1e-7: ratio=1,
    # advantages ≈ 0 after normalization), so atol dominates; a real
    # miscompile (lost updates, leaked labels) shifts these by orders of
    # magnitude, not fractions of 1e-4.
    for k in ("loss", "pg_loss", "v_loss", "entropy", "reward_per_step"):
        np.testing.assert_allclose(
            stats_t[k], stats_c[k], rtol=0.05, atol=1e-4,
            err_msg=f"stat {k}: tpu={stats_t[k]} cpu={stats_c[k]}")
    # Param norms: only head_out receives SYSTEMATIC gradients here
    # (value loss on identical data). embed/trunk grads flow through the
    # zero-initialized head kernel, so they are pure bf16 rounding noise
    # — and adam maps noise-scale grads to ~sign(g)*lr updates, making
    # their norms backend-divergent by construction (measured: trunk
    # bias 3.8e-4 TPU vs 2.7e-4 CPU). A grads-path miscompile still
    # shows: head_out norms shift grossly, stats drift, or the
    # deterministic env trajectory breaks.
    for k in norms_t:
        if "head_out" not in k:
            assert np.isfinite(norms_t[k]) and np.isfinite(norms_c[k]), k
            continue
        np.testing.assert_allclose(
            norms_t[k], norms_c[k], rtol=0.10, atol=1e-6,
            err_msg=f"param-norm {k}: tpu={norms_t[k]} cpu={norms_c[k]}")


def test_planner_distance_fields_scale_match_cpu():
    """Planner BFS fields at batch scale, TPU vs CPU bit-equal.

    distance_field composes four directional cummax relaxation scans per
    sweep under vmap — the exact op family XLA:TPU miscompiled in the
    flood fill at B >= ~1024 (labels leaking across segments when the
    scans fuse). The planner uses the primitives' native reverse=/axis=
    like the fixed flood fill, but per the defense policy any
    batched-scan composition gets a scale pin."""
    import jax.numpy as jnp

    from pogema_tpu import GridConfig, PogemaCore
    from pogema_tpu.core.planner import distance_fields

    cfg = GridConfig(seed=3, size=64, density=0.3, num_agents=16,
                     obs_radius=5, max_episode_steps=64)
    core = PogemaCore(cfg, num_envs=1024, device="default")
    state, _ = core.reset(jax.random.key(3))

    fields = jax.jit(jax.vmap(distance_fields))
    tpu = np.asarray(fields(state.obstacles, state.targets_xy))

    cpu_dev = _cpu_device()
    with jax.default_device(cpu_dev):
        obst = jax.device_put(np.asarray(state.obstacles), cpu_dev)
        txy = jax.device_put(np.asarray(state.targets_xy), cpu_dev)
        cpu = np.asarray(fields(obst, txy))

    assert np.array_equal(tpu, cpu)
    # Sanity: every agent's own start is reachable (finite distance).
    axy = np.asarray(state.agents_xy)
    b = np.arange(axy.shape[0])[:, None]
    n = np.arange(axy.shape[1])[None, :]
    d_start = tpu[b, n, axy[..., 0], axy[..., 1]]
    assert (d_start < 74 * 74).all()
