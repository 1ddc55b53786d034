#!/usr/bin/env python
"""Statistical FER comparison of the edge-kernel matmul exactness modes.

Runs the fused MC kernel at one SNR with a large frame budget for each mode
and reports FER with binomial CIs + the two-proportion z-score.  Use before
changing the default mode: min-sum decisions are tie-sensitive, so reduced
matmul precision must be shown statistically indistinguishable (|z| < 3)
at the resolution that matters for the FER curve.

Trace-time switches that don't key the jit cache (e.g. the
``SLDPC_MSG_HARVEST`` sampler choice) need one process per setting::

    python scripts/fer_mode_check.py --compare-env SLDPC_MSG_HARVEST=0,1

runs this script once per value in a subprocess (single mode, first of
FER_MODES) and reports the two-proportion z between the settings.
"""

import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

BATCH = int(os.environ.get("FER_BATCH", 2097152))
STEPS = int(os.environ.get("FER_STEPS", 4))
SNR = float(os.environ.get("FER_SNR", 3.0))
ITERS = int(os.environ.get("FER_ITERS", 12))
MODES = os.environ.get("FER_MODES", "split,bf16").split(",")


def compare_env(spec):
    """Run this script once per env value in subprocesses and z-test."""
    name, values = spec.split("=")
    vals = values.split(",")
    if len(vals) != 2 or vals[0] == vals[1]:
        raise SystemExit(f"--compare-env needs exactly 2 distinct values, "
                         f"got {vals}")
    results = {}
    for val in vals:
        env = dict(os.environ, **{name: val, "FER_MODES": MODES[0]})
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        m = re.search(r"frames=(\d+) errors=(\d+)", out)
        if m is None:
            raise SystemExit(
                f"{name}={val}: no 'frames=... errors=...' line in output:\n"
                f"{out}"
            )
        results[val] = (int(m.group(1)), int(m.group(2)))
        print(f"{name}={val}: {out.strip().splitlines()[-1]}", flush=True)
    (n1, e1), (n2, e2) = list(results.values())
    p = (e1 + e2) / (n1 + n2)
    z = (e1 / n1 - e2 / n2) / np.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
    print(f"two-proportion z = {z:+.2f}  "
          f"({'indistinguishable' if abs(z) < 3 else 'DIFFERENT'})")


def main():
    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.ops import nms
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import fused_counters_edge

    code = get_code("ccsds_128_64")
    params = nms.init_params("NMS-1")
    results = {}
    for mode in MODES:
        frames = errors = 0
        t0 = time.perf_counter()
        for i in range(STEPS):
            c = np.asarray(fused_counters_edge(
                code, params, "NMS-1", ITERS, SNR, BATCH, seed=1000 + i,
                block_frames=512, mode=mode,
            ))
            frames += int(c[0])
            errors += int(c[1])
        dt = time.perf_counter() - t0
        fer = errors / frames
        se = np.sqrt(fer * (1 - fer) / frames)
        results[mode] = (fer, se, frames, errors)
        print(f"mode={mode:8s} frames={frames} errors={errors} "
              f"FER={fer:.6f} +- {se:.6f}  ({frames/dt:,.0f} cw/s)")
    if len(results) == 2:
        (f1, s1, n1, e1), (f2, s2, n2, e2) = results.values()
        p = (e1 + e2) / (n1 + n2)
        z = (f1 - f2) / np.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
        print(f"two-proportion z = {z:+.2f}  ({'indistinguishable' if abs(z) < 3 else 'DIFFERENT'})")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--compare-env":
        compare_env(sys.argv[2])
    else:
        main()
