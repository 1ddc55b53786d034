#!/usr/bin/env python
"""Validate the early-termination cascade on the real chip.

1. throughput: cascade vs one-shot fused edge kernel at the bench operating
   point (CCSDS, 12 iters, 3.0 dB, 2M frames);
2. statistical FER parity: z-test of cascade FER (hash RNG + early stop)
   against the one-shot kernel FER (stateful PRNG, full 12 iterations).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import nms
from short_ldpc_decoding_osd_tpu.ops.mc_cascade import cascade_counters
from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import fused_counters_edge

B = int(os.environ.get("CHECK_BATCH", 1 << 21))
STEPS = int(os.environ.get("CHECK_STEPS", 4))
T1 = int(os.environ.get("CHECK_T1", 4))
SNR = float(os.environ.get("CHECK_SNR", 3.0))


def main():
    code = get_code("ccsds_128_64")
    params = nms.init_params("NMS-1")

    t0 = time.perf_counter()
    c = np.asarray(cascade_counters(code, params, "NMS-1", 12, SNR, B, 0, t1=T1))
    print(f"cascade compile+run {time.perf_counter()-t0:.1f}s counters {c}",
          flush=True)
    t0 = time.perf_counter()
    o = np.asarray(fused_counters_edge(code, params, "NMS-1", 12, SNR, B, 0,
                                       block_frames=512, mode="bf16"))
    print(f"one-shot warm run {time.perf_counter()-t0:.1f}s counters {o}",
          flush=True)

    # --- throughput (amortized: queue STEPS dispatches, sync once) ---
    for name, fn in (
        ("one-shot", lambda s: fused_counters_edge(
            code, params, "NMS-1", 12, SNR, B, s, block_frames=512, mode="bf16")),
        ("cascade ", lambda s: cascade_counters(
            code, params, "NMS-1", 12, SNR, B, s, t1=T1)),
    ):
        best = 1e9
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(STEPS):
                out = fn(100 + rep * STEPS + i)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / STEPS)
        print(f"{name}: {best*1e3:8.1f} ms/step  {B/best/1e6:8.2f} M cw/s",
              flush=True)

    # --- statistical FER parity ---
    cas_err = cas_frames = one_err = one_frames = 0.0
    for s in range(STEPS):
        c = np.asarray(cascade_counters(code, params, "NMS-1", 12, SNR, B,
                                        1000 + s, t1=T1))
        o = np.asarray(fused_counters_edge(code, params, "NMS-1", 12, SNR, B,
                                           2000 + s, block_frames=512,
                                           mode="bf16"))
        cas_err += c[1]; cas_frames += c[0]
        one_err += o[1]; one_frames += o[0]
    p1 = cas_err / cas_frames
    p2 = one_err / one_frames
    pp = (cas_err + one_err) / (cas_frames + one_frames)
    z = (p1 - p2) / np.sqrt(pp * (1 - pp) * (1 / cas_frames + 1 / one_frames))
    print(f"FER cascade {p1:.6f} ({int(cas_frames)} fr)  "
          f"one-shot {p2:.6f} ({int(one_frames)} fr)  z = {z:+.2f}", flush=True)


if __name__ == "__main__":
    main()
