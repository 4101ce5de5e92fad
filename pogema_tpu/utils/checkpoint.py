"""Checkpoint / resume (SURVEY.md §5): env + learner state are pure
pytrees, so checkpointing is a direct orbax save/restore. The reference
has no checkpointing in core; this is the TPU-native equivalent needed
for long multi-host runs (restart tolerance = checkpointed
EnvState/TrainState + deterministic reconstruction from (seed, step))."""

from __future__ import annotations

import jax


def save_checkpoint(path: str, tree) -> None:
    """Save any pytree (EnvState, TrainState, params, ...) to ``path``."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _keys_to_data(tree), force=True)


def restore_checkpoint(path: str, like=None):
    """Restore a pytree. Pass ``like`` (a pytree of the same structure,
    e.g. from a fresh ``reset``/``init``) to restore typed PRNG keys and
    exact dtypes/shardings."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        restored = ckptr.restore(path, item=_keys_to_data(like))
    return _data_to_keys(restored, like)


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
