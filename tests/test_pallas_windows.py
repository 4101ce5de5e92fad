"""Pallas packed-window kernel vs the XLA einsum path (interpret mode —
runs on CPU; hardware-verified separately, see the module docstring)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pogema_tpu.ops.pallas_windows import extract_windows_packed
from pogema_tpu.ops.windows import extract_windows


@pytest.mark.parametrize("seed", [0, 1])
def test_packed_matches_einsum_path(seed):
    rng = np.random.default_rng(seed)
    b, p, n, w = 3, 20, 5, 5
    grid = rng.integers(0, 2, size=(b, p, p)).astype(np.uint8)
    xy = rng.integers(2, p - 3, size=(b, n, 2)).astype(np.int32)
    packed = np.asarray(
        extract_windows_packed(jnp.asarray(grid), jnp.asarray(xy), w,
                               interpret=True)
    )
    for bi in range(b):
        ref = np.asarray(extract_windows(grid[bi], jnp.asarray(xy[bi]), w))
        assert np.array_equal(packed[bi, :, : w * w].reshape(n, w, w), ref)
        assert (packed[bi, :, w * w :] == 0).all()
