"""Checkpoint/resume roundtrip (SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pogema_tpu import GridConfig, PogemaCore
from pogema_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def test_env_state_roundtrip(tmp_path):
    cfg = GridConfig(seed=0, size=8, density=0.2, num_agents=3, obs_radius=2,
                     max_episode_steps=8)
    core = PogemaCore(cfg, num_envs=4)
    state, obs = core.reset(0)
    state, res, done, mets = core.step(state, jnp.ones((4, 3), jnp.int32))

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)

    fresh, _ = core.reset(1)  # different state, same structure
    restored = restore_checkpoint(path, like=fresh)

    assert np.array_equal(np.asarray(restored.obstacles), np.asarray(state.obstacles))
    assert np.array_equal(np.asarray(restored.agents_xy), np.asarray(state.agents_xy))
    assert int(restored.step_count.sum()) == int(state.step_count.sum())

    # resumed state steps identically to the original
    s1, r1, d1, _ = core.step(state, jnp.zeros((4, 3), jnp.int32))
    s2, r2, d2, _ = core.step(restored, jnp.zeros((4, 3), jnp.int32))
    assert np.array_equal(np.asarray(s1.agents_xy), np.asarray(s2.agents_xy))
    assert np.array_equal(np.asarray(r1.rewards), np.asarray(r2.rewards))


def test_params_roundtrip(tmp_path):
    from pogema_tpu.models import init_params

    model, params = init_params(jax.random.key(0), 5, hidden=16, channels=2)
    path = str(tmp_path / "params")
    save_checkpoint(path, params)
    _, fresh = init_params(jax.random.key(1), 5, hidden=16, channels=2)
    restored = restore_checkpoint(path, like=fresh)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_overwrite_is_crash_safe(tmp_path):
    """save_checkpoint overwrites via write-new-then-swap: a process
    killed at any point leaves a restorable checkpoint (old or new).
    The plain force=True protocol deletes the old state first — a
    mid-save kill then loses BOTH (bit us in a real E-shape training
    run: a hung-tunnel kill landed mid checkpoint-every save and the
    resume silently restarted from scratch)."""
    from pogema_tpu.utils.checkpoint import checkpoint_exists

    p = str(tmp_path / "ck")
    save_checkpoint(p, {"a": np.arange(3)})
    save_checkpoint(p, {"a": np.arange(3) * 2})  # overwrite
    assert (restore_checkpoint(p)["a"] == [0, 2, 4]).all()
    # simulate a crash between the two swap renames: main dir gone,
    # .bak still present — restore and existence-check must fall back
    os.rename(p, p + ".bak")
    assert checkpoint_exists(p)
    assert (restore_checkpoint(p)["a"] == [0, 2, 4]).all()
    # and a fresh save from that state heals the layout
    save_checkpoint(p, {"a": np.arange(3) * 3})
    assert (restore_checkpoint(p)["a"] == [0, 3, 6]).all()
    assert not os.path.exists(p + ".bak")


def test_recovery_save_promotes_next_before_bak_delete(tmp_path, monkeypatch):
    """In the post-crash state (main dir absent, only .bak on disk), a
    new save must rename .next into place BEFORE rmtree'ing .bak —
    rmtree of a multi-GB state is not instantaneous, and a kill inside
    it previously left only the unrecognized .next behind (ADVICE r4)."""
    import shutil as _shutil

    from pogema_tpu.utils.checkpoint import checkpoint_exists

    p = str(tmp_path / "ck")
    save_checkpoint(p, {"a": np.arange(3)})
    os.rename(p, p + ".bak")  # crash between the swap renames

    real_rmtree = _shutil.rmtree
    def dying_rmtree(path, *a, **kw):
        if path == p + ".bak":
            raise KeyboardInterrupt("kill during .bak rmtree")
        return real_rmtree(path, *a, **kw)
    monkeypatch.setattr("shutil.rmtree", dying_rmtree)

    with pytest.raises(KeyboardInterrupt):
        save_checkpoint(p, {"a": np.arange(3) * 5})
    # The NEW checkpoint must already be live under the main path.
    assert checkpoint_exists(p)
    monkeypatch.setattr("shutil.rmtree", real_rmtree)
    assert (restore_checkpoint(p)["a"] == [0, 5, 10]).all()


def test_extract_params_from_state(tmp_path):
    """Params harvested from a full TrainState checkpoint (the
    ``<ckpt>_state`` file) equal the in-memory params, and the saved
    copy loads as a normal params checkpoint (round-4 harvest path,
    now a tested helper instead of a session-history snippet)."""
    from pogema_tpu.models import init_embed_params
    from pogema_tpu.parallel import PPOConfig, init_fused_train_state
    from pogema_tpu.utils.checkpoint import extract_params_from_state

    cfg = GridConfig(seed=0, size=8, density=0.2, num_agents=2, obs_radius=2,
                     max_episode_steps=8, on_target="restart")
    core = PogemaCore(cfg, num_envs=4, auto_reset_mode="regen")
    ppo = PPOConfig(rollout_steps=4, epochs=1, minibatches=2)
    model, params = init_embed_params(jax.random.key(0), 5, embed=16, hidden=16)
    ts, _ = init_fused_train_state(core, model, params, ppo, jax.random.key(1))

    state_path = str(tmp_path / "run_state")
    save_checkpoint(state_path, {"iter": np.int64(7), "ts": ts})

    params_path = str(tmp_path / "harvested")
    it, harvested = extract_params_from_state(state_path, params_path)
    assert it == 7
    flat_src = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(params)}
    flat_out = jax.tree_util.tree_leaves_with_path(harvested)
    assert len(flat_out) == len(flat_src) > 0

    reloaded = restore_checkpoint(params_path, like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(reloaded)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # a params checkpoint is NOT a state checkpoint — must refuse
    with pytest.raises(ValueError):
        extract_params_from_state(params_path)


def test_training_resume_equals_uninterrupted(tmp_path):
    """save -> restore -> continue reproduces an uninterrupted run
    bit-exactly: params, opt state, env state and PRNG all round-trip
    through orbax (VERDICT r1 item 8 / SURVEY.md §5 failure recovery)."""
    from pogema_tpu.models import init_embed_params
    from pogema_tpu.parallel import (
        PPOConfig, init_fused_train_state, make_fused_train_step,
    )

    cfg = GridConfig(seed=0, size=8, density=0.2, num_agents=2, obs_radius=2,
                     max_episode_steps=8, on_target="restart")
    core = PogemaCore(cfg, num_envs=8, auto_reset_mode="regen")
    ppo = PPOConfig(rollout_steps=4, epochs=1, minibatches=2)
    model, params = init_embed_params(jax.random.key(0), 5, embed=16, hidden=16)
    ts, tx = init_fused_train_state(core, model, params, ppo, jax.random.key(1))
    train_step = jax.jit(make_fused_train_step(core, model, ppo, tx))

    # uninterrupted: 4 steps
    ts_a = ts
    for _ in range(4):
        ts_a, _ = train_step(ts_a)

    # interrupted: 2 steps, checkpoint, restore into a FRESH state, 2 more
    ts_b = ts
    for _ in range(2):
        ts_b, _ = train_step(ts_b)
    path = str(tmp_path / "train_ckpt")
    save_checkpoint(path, ts_b)

    ts_fresh, _ = init_fused_train_state(core, model, params, ppo,
                                         jax.random.key(2))
    ts_c = restore_checkpoint(path, like=ts_fresh)
    for _ in range(2):
        ts_c, _ = train_step(ts_c)

    for a, c in zip(jax.tree.leaves(ts_a.params), jax.tree.leaves(ts_c.params)):
        assert np.array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree.leaves(ts_a.opt_state), jax.tree.leaves(ts_c.opt_state)):
        assert np.array_equal(np.asarray(a), np.asarray(c))
    assert np.array_equal(np.asarray(ts_a.env_state.agents_xy),
                          np.asarray(ts_c.env_state.agents_xy))
    assert np.array_equal(jax.random.key_data(ts_a.key),
                          jax.random.key_data(ts_c.key))


@pytest.mark.skipif(
    not os.environ.get("POGEMA_HEAVY_TESTS"),
    reason="3 subprocess train runs (~7 min solo, times out under load); "
           "set POGEMA_HEAVY_TESTS=1 — the same mechanism is covered "
           "in-process by test_training_resume_equals_uninterrupted",
)
def test_train_ppo_runner_resume(tmp_path):
    """Restart tolerance at the RUNNER level (examples/train_ppo.py):
    interrupt-after-2 + --resume for 2 more == 4 uninterrupted iters,
    compared on the final params checkpoint (VERDICT r1 §5 'no
    restart-tolerant runner')."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    base = [sys.executable, os.path.join(repo, "examples", "train_ppo.py"),
            "--envs", "8", "--agents", "2", "--size", "8",
            "--rollout-steps", "4", "--on-target", "restart",
            "--embed", "16", "--hidden", "16", "--log-every", "4"]

    def run(extra):
        subprocess.run(base + extra, env=env, check=True, timeout=420,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    ckpt_a = str(tmp_path / "a")
    run(["--iters", "4", "--checkpoint", ckpt_a])

    ckpt_b = str(tmp_path / "b")
    run(["--iters", "2", "--checkpoint", ckpt_b, "--checkpoint-every", "2"])
    run(["--iters", "4", "--checkpoint", ckpt_b, "--checkpoint-every", "2",
         "--resume"])

    pa = restore_checkpoint(ckpt_a)
    pb = restore_checkpoint(ckpt_b)
    la, lb = jax.tree.leaves(pa), jax.tree.leaves(pb)
    assert len(la) == len(lb) and len(la) > 0
    for a, b in zip(la, lb):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_train_ppo_init_params_warm_start(tmp_path):
    """--init-params loads a params checkpoint as the initialization
    (fine-tune phase 2). With --lr 0 the warm-started run's final params
    must equal the source checkpoint bit-exactly — proving the load is
    wired through (and that relative checkpoint paths are absolutized;
    orbax rejects relative paths mid-run)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    base = [sys.executable, os.path.join(repo, "examples", "train_ppo.py"),
            "--envs", "8", "--agents", "2", "--size", "8",
            "--rollout-steps", "4", "--on-target", "restart",
            "--embed", "16", "--hidden", "16", "--log-every", "2"]

    ckpt_a = str(tmp_path / "a")
    subprocess.run(base + ["--iters", "2", "--checkpoint", ckpt_a],
                   env=env, check=True, timeout=420,
                   stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    # Relative --checkpoint exercises the abspath fix (run from tmp_path).
    out = subprocess.run(
        base + ["--iters", "1", "--lr", "0", "--init-params", ckpt_a,
                "--checkpoint", "b"],
        env=env, check=True, timeout=420, cwd=str(tmp_path),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    assert b"warm-started params from" in out.stdout

    pa = restore_checkpoint(ckpt_a)
    pb = restore_checkpoint(str(tmp_path / "b"))
    la, lb = jax.tree.leaves(pa), jax.tree.leaves(pb)
    assert len(la) == len(lb) and len(la) > 0
    for a, b in zip(la, lb):
        assert np.array_equal(np.asarray(a), np.asarray(b))
