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
    args = ap.parse_args()

    import jax

    if args.coordinator and args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import numpy as np

    from short_ldpc_decoding_osd_tpu.channel import ChannelSpec
    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.ops import nms
    from short_ldpc_decoding_osd_tpu.parallel import make_mesh, sharded_nms_mc_step
    from short_ldpc_decoding_osd_tpu.utils.metrics import DecodeStats, wilson_interval

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
        spec = ChannelSpec.awgn(float(snr), code.rate)
        with mesh:
            step = sharded_nms_mc_step(
                code, args.variant, args.iterations, spec,
                args.per_device_batch, mesh,
            )
            stats = DecodeStats(bits_per_frame=code.n)
            key = jax.random.PRNGKey(int(snr * 1000))
            i = 0
            t0 = time.time()
            while (
                stats.frames < args.max_frames
                and stats.frame_errors <= args.error_budget
            ):
                c = np.asarray(step(params, jax.random.fold_in(key, i)))
                i += 1
                stats = stats.merge(
                    DecodeStats(
                        frames=int(c[0]), frame_errors=int(c[1]),
                        bit_errors=int(c[2]), bits_per_frame=code.n,
                        detected_failures=int(c[3]), undetected_errors=int(c[4]),
                    )
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
