#!/usr/bin/env python
"""Multi-host Monte-Carlo FER sweep launcher.

Run one copy per host (e.g. via your pod scheduler):

    python scripts/run_multihost.py --coordinator <host0>:1234 \
        --num-processes 4 --process-id $ID --snrs 2.0:3.5:7

Each host joins the jax.distributed cluster; the global mesh spans every chip
of the slice; frames shard over all of them and the counters psum over
ICI/DCN.  Host 0 applies the error-budget early stop and writes the curve.
On a single host this degenerates to the local-mesh path (no coordinator
needed).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None, help="host0 address:port")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--code", default="ccsds_128_64")
    ap.add_argument("--variant", default="NMS-1")
    ap.add_argument("--iterations", type=int, default=12)
    ap.add_argument("--snrs", default="2.0:3.5:7")
    ap.add_argument("--per-device-batch", type=int, default=16384)
    ap.add_argument("--error-budget", type=int, default=40000)
    ap.add_argument("--max-frames", type=int, default=10**9)
    ap.add_argument("--params", default=None, help="pickle of trained params")
    ap.add_argument("--out", default="runs/multihost_fer.json")
    ap.add_argument(
        "--mesh-rung", choices=["compact", "oneshot", "xla"], default=None,
        help="pre-pin the fused-kernel ladder rung uniformly across hosts "
             "(demotion is host-local and disabled under >1 process; pass "
             "the rung known to fit this code instead). Sets SLDPC_MESH_RUNG.",
    )
    args = ap.parse_args()
    if args.mesh_rung:
        os.environ["SLDPC_MESH_RUNG"] = args.mesh_rung

    from short_ldpc_decoding_osd_tpu.parallel.mesh import init_multihost

    init_multihost(args.coordinator, args.num_processes, args.process_id)
    import jax

    import numpy as np

    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.mc import run_nms_mc
    from short_ldpc_decoding_osd_tpu.ops import nms
    from short_ldpc_decoding_osd_tpu.parallel import make_mesh
    from short_ldpc_decoding_osd_tpu.utils.metrics import wilson_interval

    code = get_code(args.code)
    if args.params:
        import pickle

        with open(args.params, "rb") as fh:
            params = pickle.load(fh)
    else:
        params = nms.init_params(args.variant, code.h)

    mesh = make_mesh()  # all visible devices (global across hosts)
    lo, hi, num = args.snrs.split(":")
    snrs = np.linspace(float(lo), float(hi), int(num))
    points = []
    for snr in snrs:
        # the harness runs the fused edge-kernel ladder on every device of
        # the mesh (counters psum over ICI/DCN); every host executes the same
        # step sequence and sees identical psum'd counters, so the budget
        # early-stop decisions agree across processes
        t0 = time.time()
        with mesh:
            stats, _ = run_nms_mc(
                code, params, args.variant, args.iterations, float(snr),
                batch=args.per_device_batch,
                error_budget=args.error_budget,
                max_frames=args.max_frames,
                seed=int(snr * 1000),
                mesh=mesh,
            )
        ci = wilson_interval(stats.frame_errors, stats.frames)
        point = {
            "snr_db": float(snr), **stats.to_dict(), "fer_ci": list(ci),
            "frames_per_s": stats.frames / max(time.time() - t0, 1e-9),
            "devices": mesh.devices.size,
            "hosts": jax.process_count(),
        }
        points.append(point)
        if jax.process_index() == 0:
            print(json.dumps(point), flush=True)
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "wt") as fh:
            json.dump({"points": points}, fh, indent=1)


if __name__ == "__main__":
    main()
