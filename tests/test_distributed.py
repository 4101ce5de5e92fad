"""Multi-process ``jax.distributed`` loopback test (VERDICT r1 item 2).

Spawns 2 real OS processes, each with 4 virtual CPU devices, joined by a
loopback coordinator into one 8-device global mesh; runs the fused
sharded PPO train step across them and asserts:

* both processes compute the identical loss and trajectory checksum
  (the program is one SPMD computation over the global mesh);
* those values equal a single-process 8-device reference run — i.e. the
  multi-process sharding changes nothing (the only obtainable multi-host
  correctness evidence without a pod; SURVEY.md §4 (c)).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NUM_ENVS = 8


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_and_collect(nproc, local_devices):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "distributed_worker.py"),
             f"localhost:{port}", str(pid), str(nproc), str(NUM_ENVS)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(nproc)
    ]
    results, errors = {}, []
    for w in workers:
        out, err = w.communicate(timeout=240)
        if w.returncode != 0:
            errors.append(err[-3000:])
            continue
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss, chk = line.split()
                results[int(pid)] = (float(loss), int(chk))
    return results, errors


def test_two_process_loopback_matches_single_process():
    nproc, local_devices = 2, 4
    results, errors = _spawn_and_collect(nproc, local_devices)
    if errors and any("DEADLINE_EXCEEDED" in e for e in errors):
        # Gloo's 30s rendezvous window can expire when the machine is
        # saturated and one worker is still importing/compiling —
        # environmental, not a correctness signal; one quiet retry.
        results, errors = _spawn_and_collect(nproc, local_devices)
    assert not errors, f"worker failed:\n{errors[0]}"
    assert sorted(results) == [0, 1], results

    # SPMD: every process sees the same replicated outputs.
    assert results[0] == results[1], results

    # Single-process 8-device reference (the conftest mesh).
    from tests.distributed_worker import build_and_run

    ref_loss, ref_chk = build_and_run(NUM_ENVS)
    assert results[0][1] == ref_chk, (results, ref_chk)
    assert abs(results[0][0] - ref_loss) < 1e-5, (results, ref_loss)
