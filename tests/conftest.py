"""Test harness config: force CPU with 8 virtual devices so sharding and
mesh tests run anywhere (SURVEY.md §4: multi-host tests on a virtual CPU
mesh).

NOTE: this environment's ``sitecustomize`` imports jax at interpreter
startup (with JAX_PLATFORMS=axon), so setting os.environ here is too
late. ``jax.config.update`` still works because backends are created
lazily at first use, and XLA_FLAGS is read at client-creation time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# POGEMA_TEST_TPU=1 leaves the default (accelerator) platform in place so
# backend-sensitive suites (e.g. golden fixtures) can be replayed on real
# hardware: POGEMA_TEST_TPU=1 pytest tests/test_golden_fixtures.py
if not os.environ.get("POGEMA_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
