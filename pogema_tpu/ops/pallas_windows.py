"""Experimental Pallas window-extraction kernel (packed-lane output).

Computes the same egocentric obstacle windows as
:func:`pogema_tpu.ops.windows.extract_windows`, but emits them packed as
121 lanes per agent ([B, N, 128] with lanes 121..127 zero), using a
single fused VMEM pipeline per env:

  one-hot row-select matmul (MXU)
  -> combined alignment+fold barrel rotation: each window row (n, i)
     rotates by (y_n - r - 11*i) mod 128, so its 11 columns land at
     lanes [11*i, 11*i+11)
  -> lane mask + sublane-group sum -> [N, 128] packed windows.

STATUS (v5e, measured): correct (bit-exact vs the XLA path, verified in
interpret mode and on hardware), but ~25 ms/step at config-C scale vs
~9 ms for the XLA einsum path — the per-env sequential Pallas grid
(4096 programs x ~6 us) dominates; the 7-stage f32 barrel on a
[704, 128] tile is the hot inner loop (Mosaic requires 32-bit rotates).
Kept as (a) a worked example of the kernel recipe, (b) the starting
point if a future Mosaic gains cheap sublane->lane relayouts, and
(c) regression coverage for Pallas-on-CPU (interpret mode) in CI.

Use the XLA path (`ops.windows.extract_windows`) in production.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(p: int, n: int, w: int):
    nw = n * w

    def kernel(grid_ref, rowidx_ref, shift_ref, out_ref):
        g = grid_ref[0].astype(jnp.int32).astype(jnp.bfloat16)  # [P, P]
        rows = rowidx_ref[0, 0]  # [NW] i32: x_agent - r + i
        iota_p = lax.broadcasted_iota(jnp.int32, (nw, p), 1)
        ohr = (rows[:, None] == iota_p).astype(jnp.bfloat16)
        t1 = jnp.dot(ohr, g, preferred_element_type=jnp.float32)  # [NW, P]
        t1 = jnp.pad(t1, ((0, 0), (0, 128 - p)))  # f32: Mosaic rotate is 32-bit
        s = shift_ref[0, 0]  # [NW] i32: y_agent - r (repeated per row)
        i_part = lax.broadcasted_iota(jnp.int32, (nw, 1), 0)[:, 0] % w
        rot = (s - w * i_part) % 128
        for k in range(7):
            bit = ((rot >> k) & 1)[:, None] > 0
            rolled = pltpu.roll(t1, 128 - (1 << k), axis=1)
            t1 = jnp.where(bit, rolled, t1)
        lane = lax.broadcasted_iota(jnp.int32, (nw, 128), 1)
        lo = (w * i_part)[:, None]
        t1 = jnp.where((lane >= lo) & (lane < lo + w), t1, 0.0)
        out_ref[0] = jnp.sum(t1.reshape(n, w, 128), axis=1)

    return kernel


def extract_windows_packed(grid, xy, w: int, interpret: bool = False):
    """grid: u8[B, P, P]; xy: i32[B, N, 2]. Returns f32[B, N, 128] with
    window (n) flattened row-major into lanes [0, w*w)."""
    b, p, _ = grid.shape
    n = xy.shape[1]
    nw = n * w
    assert w * w <= 128, "packed layout requires w*w <= 128"
    r = w // 2
    offs = jnp.arange(w, dtype=jnp.int32) - r
    rowidx = (xy[:, :, 0:1] + offs).reshape(b, 1, nw)
    shift = jnp.repeat(xy[:, :, 1] - r, w, axis=1).reshape(b, 1, nw)
    return pl.pallas_call(
        _kernel(p, n, w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, 128), jnp.float32),
        interpret=interpret,
    )(grid, rowidx, shift)
