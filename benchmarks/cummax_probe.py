"""Primitive-level probe for the XLA:TPU batched-scan miscompile.

Compares, at [B, 138, 138] i32 vs CPU:
  - lax.cummax(axis=-1)
  - jnp.cumsum(axis=-1)
  - lax.associative_scan(jnp.maximum, axis=-1)  (candidate workaround)
  - manual Hillis-Steele doubling max scan      (fallback workaround)

Usage: timeout 420 python benchmarks/cummax_probe.py [B]
"""

import sys

import faulthandler

faulthandler.dump_traceback_later(400, exit=True)

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
P = 138

cpu = jax.local_devices(backend="cpu")[0]
rng = np.random.default_rng(0)
x_host = rng.integers(-(2**20), 2**20, size=(B, P, P), dtype=np.int32)


def doubling_max(w):
    k = 1
    n = w.shape[-1]
    while k < n:
        shifted = jnp.pad(w[..., :-k], [(0, 0)] * (w.ndim - 1) + [(k, 0)],
                          constant_values=np.int32(np.iinfo(np.int32).min))
        w = jnp.maximum(w, shifted)
        k *= 2
    return w


FNS = {
    "cummax": lambda x: lax.cummax(x, axis=x.ndim - 1),
    "cumsum": lambda x: jnp.cumsum(x, axis=-1),
    "assoc_max": lambda x: lax.associative_scan(jnp.maximum, x, axis=-1),
    "doubling": doubling_max,
}

x_dev = jax.device_put(x_host)
x_cpu = jax.device_put(x_host, cpu)

ref_cummax = np.maximum.accumulate(x_host, axis=-1)
ref_cumsum = np.cumsum(x_host, axis=-1, dtype=np.int64).astype(np.int32)
REF = {"cummax": ref_cummax, "cumsum": ref_cumsum,
       "assoc_max": ref_cummax, "doubling": ref_cummax}

for name, fn in FNS.items():
    f = jax.jit(fn)
    got_dev = np.asarray(f(x_dev))
    got_cpu = np.asarray(f(x_cpu))
    ok_dev = np.array_equal(got_dev, REF[name])
    ok_cpu = np.array_equal(got_cpu, REF[name])
    n_bad = int((got_dev != REF[name]).sum())
    print(f"{name:10s} TPU-correct={ok_dev} CPU-correct={ok_cpu} "
          f"(bad elements on TPU: {n_bad})", flush=True)
