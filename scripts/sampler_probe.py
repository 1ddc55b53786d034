#!/usr/bin/env python
"""Measure where the fused MC kernel's fixed per-frame cost goes (round-2
known gap: ~10 ns/frame sampling+encode+count vs ~19 ns decode).

Each variant monkeypatches the sampler used inside the one-shot edge MC
kernel BEFORE the first trace and times the kernel; run one variant per
process (the jit cache keys on arguments, not on the patched sampler):

  base      current sampler (Box-Muller pairs + spare-bit msg harvest;
            SLDPC_MSG_HARVEST=0 selects the separate-msg-draw variant)
  uniform   centered uniforms (WRONG distribution - timing only): no
            log/sqrt/cos/sin, isolates the transcendental cost
  halfbits  Box-Muller from 16-bit uniform halves: half the PRNG words
            (WRONG tails past 3.9 sigma - timing only here)
  decode    decode_final_edge on a resident HBM llr (no sampling, no
            counting): the decode-only floor

Usage: for v in base uniform halfbits decode; do
         python scripts/sampler_probe.py --variant $v; done
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="base")
    ap.add_argument("--batch", type=int, default=2**21)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.ops import mc_pallas, nms, nms_edge_pallas

    code = get_code("ccsds_128_64")
    params = nms.init_params("NMS-1")

    if args.variant == "uniform":
        def fake_sample(bt, n, k):
            w = mc_pallas._random_words((bt, n))
            msg = jnp.bitwise_and(w[:, :k], jnp.int32(1)).astype(jnp.float32)
            return msg, mc_pallas._u24_from_words(w) - 0.5

        nms_edge_pallas._sample_msg_and_normals = fake_sample
    elif args.variant == "constz":
        def const_sample(bt, n, k):
            # NO PRNG, NO transcendentals: synthetic per-frame-varying
            # msg/noise from iota hashes (WRONG distribution - timing only).
            # Isolates the ENTIRE sampling cost; what remains is
            # encode + decode + count.
            r = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1)
            hsh = (r * 40503 + c * 1540483477) & 0xFFFFFF
            z = hsh.astype(jnp.float32) * (2.0 / 16777216.0) - 1.0
            msg = jnp.bitwise_and(hsh[:, :k], 1).astype(jnp.float32)
            return msg, z

        nms_edge_pallas._sample_msg_and_normals = const_sample
    elif args.variant == "halfbits":
        def half_sample(bt, n, k):
            # one 32-bit word -> two 16-bit uniforms; half the PRNG draws
            TWO_PI = 6.283185307179586
            half = n // 2
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((bt, half)), jnp.int32
            )
            lo = jnp.bitwise_and(bits, jnp.int32(0xFFFF))
            hi = jnp.bitwise_and(
                jax.lax.shift_right_logical(bits, 16), jnp.int32(0xFFFF)
            )
            u1 = lo.astype(jnp.float32) * (1.0 / 65536.0) + (0.5 / 65536.0)
            u2 = hi.astype(jnp.float32) * (1.0 / 65536.0) + (0.5 / 65536.0)
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            theta = TWO_PI * u2
            z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)],
                                axis=1)
            msg = jnp.bitwise_and(
                mc_pallas._random_words((bt, k)), jnp.int32(1)
            ).astype(jnp.float32)
            return msg, z

        nms_edge_pallas._sample_msg_and_normals = half_sample

    if args.variant == "decode":
        rng = np.random.default_rng(0)
        llr = jnp.asarray(rng.normal(1.0, 0.84, (args.batch, code.n)),
                          jnp.float32)

        def step(i):
            return nms_edge_pallas.decode_final_edge(
                params, code.h, llr, args.iters, "NMS-1",
                block_frames=args.block, mode="bf16",
            )
    else:
        def step(i):
            return nms_edge_pallas.fused_counters_edge(
                code, params, "NMS-1", args.iters, 3.0, args.batch, seed=i,
                block_frames=args.block, mode="bf16",
            )

    np.asarray(step(0))
    t0 = time.perf_counter()
    out = None
    for i in range(args.steps):
        out = step(1 + i)
    np.asarray(out)
    dt = time.perf_counter() - t0
    rate = args.steps * args.batch / dt
    print(f"{args.variant}: {rate:,.0f} cw/s  ({1e9 / rate:.2f} ns/frame)")


if __name__ == "__main__":
    main()
