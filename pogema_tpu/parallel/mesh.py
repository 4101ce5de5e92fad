"""Device mesh and sharding — the distributed-communication layer the
reference does not have (SURVEY.md §2 "Parallelism & distributed
components": the rebuild's NCCL-equivalent is XLA collectives over
ICI/DCN driven by sharding annotations).

Axes:
* 'data'  — env-batch data parallelism: EnvState/trajectories shard on
  the leading B axis; chips step disjoint env slices in lockstep and the
  learner's gradient psum rides ICI.
* 'model' — optional tensor parallelism for the learner trunk.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs):
    """Multi-host bring-up (jax.distributed.initialize). No-op when
    single-process or already initialized."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Mesh('data', 'model') over all (or the given) devices. data=-1
    means "all remaining"."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), ("data", "model"))


def shard_batch(tree, mesh: Mesh):
    """Place a pytree with leading batch axis on the mesh, sharded over
    'data' and replicated over 'model'."""

    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def global_batch_from_host(tree, mesh: Mesh):
    """Multi-PROCESS version of :func:`shard_batch`: build global arrays
    sharded over the mesh 'data' axis from a host pytree that every
    process holds identically (deterministic reset ⇒ cheap and safe).
    Each process materializes only its addressable shards
    (``jax.make_array_from_callback``), so no cross-process transfer
    happens. PRNG-key leaves round-trip through key_data/wrap_key_data.
    """

    def put(x):
        is_key = hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        )
        raw = np.asarray(jax.random.key_data(x)) if is_key else np.asarray(x)
        batched = raw.ndim >= (2 if is_key else 1)  # keys carry a data dim
        sharding = NamedSharding(mesh, P("data") if batched else P())
        arr = jax.make_array_from_callback(
            raw.shape, sharding, lambda idx: raw[idx]
        )
        return jax.random.wrap_key_data(arr) if is_key else arr

    return jax.tree.map(put, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
