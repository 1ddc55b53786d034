"""REAL 2-process jax.distributed execution test (r4 VERDICT item 5).

Until round 5 the multi-host code path (``scripts/run_multihost.py`` +
``parallel.mesh.init_multihost`` + the psum'd counter reduction in
``parallel.data_parallel``) had only monkeypatched ``jax.process_count``
tests — it had never run with two actual OS processes.  This test spawns
two subprocesses that join a ``jax.distributed`` cluster over a local
coordinator (CPU backend, 4 virtual devices each -> 8 global devices),
runs the sharded Monte-Carlo step with its counter reduction crossing the
process boundary, and asserts the counters equal a single-process
8-device run bitwise.  Equality is exact by design: the sharded step draws
ONE global sample keyed only by (key, total_batch)
(``data_parallel.sharded_nms_mc_step``), so the process layout cannot
change the frames.

The axon TPU plugin must not be on PYTHONPATH in the children — it blocks
``jax.distributed.initialize`` from registering (probed round 5: with the
plugin importable, ``process_count()`` silently stays 1).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_multihost.py")

COMMON = [
    "--snrs", "2.5:2.5:1",
    "--per-device-batch", "64",
    "--error-budget", "1000000",
    "--max-frames", "1024",
    "--iterations", "4",
]


def _env(n_local: int) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = REPO  # deliberately WITHOUT the axon plugin dir
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_counters_match_single_process(tmp_path):
    port = _free_port()
    out2 = tmp_path / "two_proc.json"
    out1 = tmp_path / "one_proc.json"
    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT,
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "--out", str(out2), *COMMON],
            env=_env(4), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"

    single = subprocess.run(
        [sys.executable, SCRIPT, "--out", str(out1), *COMMON],
        env=_env(8), cwd=REPO, timeout=300,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    assert single.returncode == 0, single.stdout[-3000:]

    with open(out2) as fh:
        two = json.load(fh)["points"][0]
    with open(out1) as fh:
        one = json.load(fh)["points"][0]

    assert two["hosts"] == 2
    assert one["hosts"] == 1
    assert two["devices"] == 8 and one["devices"] == 8
    # the psum'd counters crossed a real process boundary and must equal
    # the single-process run bitwise (one global sample per step)
    for field in (
        "frames", "frame_errors", "bit_errors",
        "detected_failures", "undetected_errors",
    ):
        assert two[field] == one[field], (field, two[field], one[field])
    assert two["frames"] == 1024
