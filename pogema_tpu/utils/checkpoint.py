"""Checkpoint / resume (SURVEY.md §5): env + learner state are pure
pytrees, so checkpointing is a direct orbax save/restore. The reference
has no checkpointing in core; this is the TPU-native equivalent needed
for long multi-host runs (restart tolerance = checkpointed
EnvState/TrainState + deterministic reconstruction from (seed, step))."""

from __future__ import annotations

import jax


def save_checkpoint(path: str, tree) -> None:
    """Save any pytree (EnvState, TrainState, params, ...) to ``path``.

    Crash-safe overwrite: the new checkpoint is fully written to a
    sibling ``<path>.next`` first, then swapped in (old one renamed to
    ``<path>.bak`` until the swap lands). A process killed at ANY point
    leaves a complete checkpoint on disk — either the old or the new.
    (Plain ``force=True`` deletes the existing checkpoint before
    writing; a kill mid-save then loses BOTH, which is exactly how a
    long E-shape training run lost its resume state to a hung-tunnel
    kill in round 4.)"""
    import os
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    new, bak = path + ".next", path + ".bak"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(new, _keys_to_data(tree), force=True)
    if not os.path.exists(path):
        # Post-crash state (only .bak and/or .next exist): promote the
        # freshly-written .next FIRST — rmtree of a multi-GB .bak is not
        # instantaneous, and a kill inside it would otherwise leave only
        # the unrecognized .next behind.
        os.rename(new, path)
        if os.path.exists(bak):
            shutil.rmtree(bak)
        return
    if os.path.exists(bak):
        shutil.rmtree(bak)
    os.rename(path, bak)
    os.rename(new, path)
    shutil.rmtree(bak)


def checkpoint_exists(path: str) -> bool:
    """True if ``path`` (or its crash-recovery ``.bak``) holds a
    restorable checkpoint."""
    import os

    path = os.path.abspath(path)
    return os.path.exists(path) or os.path.exists(path + ".bak")


def restore_checkpoint(path: str, like=None):
    """Restore a pytree. Pass ``like`` (a pytree of the same structure,
    e.g. from a fresh ``reset``/``init``) to restore typed PRNG keys and
    exact dtypes/shardings. Falls back to ``<path>.bak`` when the main
    path is missing (crash between the swap renames in
    :func:`save_checkpoint`)."""
    import os

    import orbax.checkpoint as ocp

    apath = os.path.abspath(path)
    if not os.path.exists(apath) and os.path.exists(apath + ".bak"):
        path = apath + ".bak"
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        restored = ckptr.restore(path, item=_keys_to_data(like))
    return _data_to_keys(restored, like)


def extract_params_from_state(state_path: str, params_path: str | None = None):
    """Harvest model params from a FULL TrainState checkpoint (the
    ``<checkpoint>_state`` file ``train_ppo.py --checkpoint-every``
    writes, structure ``{"iter", "ts"}``) without needing the model or
    env to rebuild a ``like`` template.

    Returns ``(iter, params)``. If ``params_path`` is given, also saves
    the params there as a regular params checkpoint (loadable by the
    toolbox "PPO" algo / ``--init-params``). Used to recover a usable
    policy from an interrupted training run whose final params
    checkpoint was never written."""
    tree = restore_checkpoint(state_path)
    if not (isinstance(tree, dict) and "ts" in tree and "iter" in tree):
        raise ValueError(
            f"{state_path} is not a TrainState checkpoint "
            f"(expected {{'iter', 'ts'}} structure, got "
            f"{sorted(tree) if isinstance(tree, dict) else type(tree)})")
    params = tree["ts"]["params"]
    it = int(tree["iter"])
    if params_path is not None:
        save_checkpoint(params_path, params)
    return it, params


def _is_key(x):
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)


def _keys_to_data(tree):
    return jax.tree.map(
        lambda x: jax.random.key_data(x) if _is_key(x) else x, tree
    )


def _data_to_keys(tree, like):
    def conv(x, ref):
        if _is_key(ref):
            return jax.random.wrap_key_data(x)
        return x

    return jax.tree.map(conv, tree, like)
