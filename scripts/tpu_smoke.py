#!/usr/bin/env python
"""Real-TPU smoke test for all Pallas kernels.

The pytest suite runs on a virtual CPU mesh (interpret-mode Pallas), so a
kernel can pass the suite yet fail to *lower* on actual hardware (e.g. an
f32 tpu.iota lowering regression caught here in r2, or the default-precision
matmul bf16 truncation in ops/nms_edge_pallas.py).  Run this after touching
any kernel:

    timeout 580 python scripts/tpu_smoke.py

Exits non-zero on any failure.  Checks, per kernel:
  * it compiles and runs on the TPU backend,
  * dense NMS + GE kernels are bitwise-equal to the XLA paths,
  * the edge-compact NMS kernel matches XLA to f32 tolerance,
  * fused MC counters are statistically consistent with the XLA MC step.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if jax.default_backend() != "tpu":
        print(f"SKIP: backend is {jax.default_backend()}, not tpu")
        return 1

    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.ops import gf2ops, nms
    from short_ldpc_decoding_osd_tpu.ops.gf2_bitpack import batched_row_reduce_bitpack
    from short_ldpc_decoding_osd_tpu.ops.mc_pallas import fused_counters
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import fused_counters_edge
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import decode_final_edge
    from short_ldpc_decoding_osd_tpu.ops.nms_pallas import decode_final_pallas

    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(0)
    failures = []

    def check(name, ok, detail=""):
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")
        if not ok:
            failures.append(name)

    # --- dense NMS kernel: bitwise vs XLA ---
    llr = jnp.asarray(rng.normal(1.0, 0.8, (128, code.n)), jnp.float32)
    params = nms.init_params("NMS-1")
    h = jnp.asarray(code.h, jnp.float32)
    ref = np.asarray(nms.decode_final(params, h, llr, 12, "NMS-1"))
    got = np.asarray(decode_final_pallas(params, h, llr, 12, "NMS-1", 32))
    check("nms_pallas bitwise", np.array_equal(ref, got),
          f"maxdiff={np.abs(ref - got).max():.2e}")

    # --- edge NMS kernel: f32 tolerance vs XLA, both matmul modes ---
    llr512 = jnp.asarray(rng.normal(1.0, 0.8, (512, code.n)), jnp.float32)
    ref = np.asarray(nms.decode_final(params, h, llr512, 12, "NMS-1"))
    for mode, atol in (("highest", 1e-3), ("split", 5e-3), ("bf16", 0.3)):
        got = np.asarray(
            decode_final_edge(params, code.h, llr512, 12, "NMS-1", 512, mode=mode)
        )
        tol_ok = np.allclose(got, ref, atol=atol, rtol=atol)
        hard = ((got < 0) == (ref < 0)).mean()
        hard_min = 0.995 if mode == "bf16" else 0.999
        check(f"nms_edge[{mode}] tolerance", tol_ok and hard >= hard_min,
              f"maxdiff={np.abs(ref - got).max():.2e} hard={hard:.5f}")

    # --- trajectory edge kernel: full (T+1, B, n) stack vs XLA decode ---
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import (
        decode_traj_edge,
    )

    ref_t = np.asarray(nms.decode(params, h, llr512, 12, "NMS-1"))
    got_t = np.asarray(
        decode_traj_edge(params, code.h, llr512, 12, "NMS-1", 256,
                         mode="highest")
    )
    hard_t = ((got_t <= 0) == (ref_t <= 0)).mean()
    check(
        "nms_traj_edge[highest] tolerance",
        np.allclose(got_t, ref_t, atol=1e-2, rtol=1e-3) and hard_t >= 0.9999
        and np.array_equal(got_t[0], np.asarray(llr512)),
        f"maxdiff={np.abs(ref_t - got_t).max():.2e} hard={hard_t:.5f}",
    )

    # --- edge-layout XLA rung (large-code path): tolerance vs dense on the
    # production-scale WiMAX code ---
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_xla import (
        decode_final_edge_xla,
    )

    wx = get_code("wimax_1056_880")
    llr_w = jnp.asarray(rng.normal(1.0, 0.8, (256, wx.n)), jnp.float32)
    ref_w = np.asarray(
        nms.decode_final(params, jnp.asarray(wx.h, jnp.float32), llr_w, 12)
    )
    got_w = np.asarray(
        decode_final_edge_xla(params, np.asarray(wx.h), llr_w, 12,
                              mode="high")
    )
    hard_w = (np.sign(ref_w) == np.sign(got_w)).mean()
    check(
        "nms_edge_xla[high] wimax tolerance",
        np.allclose(ref_w, got_w, atol=1e-2, rtol=1e-3) and hard_w >= 0.9999,
        f"maxdiff={np.abs(ref_w - got_w).max():.2e} hard={hard_w:.5f}",
    )

    # --- edge-XLA rung at MC-step level: same-seed counters vs the
    # bit-exact dense step on the production-scale code (HIGH matmuls may
    # flip borderline frames; bound the drift) ---
    from short_ldpc_decoding_osd_tpu.channel import ChannelSpec
    from short_ldpc_decoding_osd_tpu.mc.harness import build_nms_mc_step

    spec_w = ChannelSpec.awgn(3.75, wx.rate)
    key_w = jax.random.PRNGKey(17)
    s_fast = build_nms_mc_step(
        wx, "NMS-1", 12, spec_w, 4096, use_pallas=False, use_edge_xla=True
    )
    s_ref = build_nms_mc_step(
        wx, "NMS-1", 12, spec_w, 4096, use_pallas=False, use_edge_xla=False
    )
    c_fast = np.asarray(s_fast(params, key_w)[0])
    c_ref = np.asarray(s_ref(params, key_w)[0])
    d_fe = abs(int(c_fast[1]) - int(c_ref[1]))
    check(
        "nms_edge_xla same-seed MC counters (wimax)",
        d_fe <= 4 and int(c_fast[0]) == int(c_ref[0]),
        f"d_frame_err={d_fe} fast={c_fast.tolist()} ref={c_ref.tolist()}",
    )

    # --- NMS-r edge-layout rung: same-seed counter drift bound vs dense ---
    p_r = nms.init_params("NMS-r", np.asarray(code.h), seed=1)
    s_rf = build_nms_mc_step(
        code, "NMS-r", 12, ChannelSpec.awgn(3.0, code.rate), 4096,
        use_pallas=False, use_edge_xla=True,
    )
    s_rr = build_nms_mc_step(
        code, "NMS-r", 12, ChannelSpec.awgn(3.0, code.rate), 4096,
        use_pallas=False, use_edge_xla=False,
    )
    key_r = jax.random.PRNGKey(23)
    c_rf = np.asarray(s_rf(p_r, key_r)[0])
    c_rr = np.asarray(s_rr(p_r, key_r)[0])
    d_r = abs(int(c_rf[1]) - int(c_rr[1]))
    check(
        "nms_edge_xla[NMS-r] same-seed MC counters",
        d_r <= 4,
        f"d_frame_err={d_r} fast={c_rf.tolist()} ref={c_rr.tolist()}",
    )

    # --- GE kernel (production bit-packed path): bitwise vs XLA on permuted H ---
    hb = np.stack([code.h[:, rng.permutation(code.n)] for _ in range(64)])
    hb = jnp.asarray(hb, jnp.int8)
    mat_p, ord_p = batched_row_reduce_bitpack(hb)
    mat_x, ord_x = gf2ops.batched_row_reduce(hb)
    check(
        "gf2_bitpack bitwise",
        bool(jnp.all(mat_p.astype(jnp.int32) == mat_x.astype(jnp.int32)))
        and bool(jnp.all(ord_p.astype(jnp.int32) == ord_x.astype(jnp.int32))),
    )

    # --- fused MC kernels: FER within 6 sigma of each other ---
    batch = 262144
    c_dense = np.asarray(fused_counters(code, params, "NMS-1", 12, 3.0, batch, 7))
    c_edge = np.asarray(
        fused_counters_edge(code, params, "NMS-1", 12, 3.0, batch, 11)
    )
    p = 0.5 * (c_dense[1] + c_edge[1]) / batch
    sig = np.sqrt(2 * p * (1 - p) / batch)
    diff = abs(c_dense[1] - c_edge[1]) / batch
    check("mc fused FER parity", diff < 6 * sig,
          f"dense={c_dense[1]/batch:.5f} edge={c_edge[1]/batch:.5f} 6sig={6*sig:.5f}")

    # --- convergence-compaction schedules: SAME-SEED counters vs one-shot
    # (identical math modulo the converged-frame early judgment, so frame
    # errors must agree to a handful of marginal frames; overflow must be 0
    # at the 1/2-capacity schedule) ---
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import (
        DEFAULT_COMPACT_SCHEDULE,
        fused_counters_edge_compact,
    )

    # (PRNG streams are per (seed, block id): one-shot reference must use the
    # SAME block_frames as the compact kernel under test)
    one = {}
    for blk, sched in (
        (512, ((4, 0.5),)),
        (512, ((4, 0.5), (2, 0.25))),
        (512, DEFAULT_COMPACT_SCHEDULE),
        (1024, ((4, 0.375),)),  # round-3 bench operating point
    ):
        if blk not in one:
            one[blk] = np.asarray(
                fused_counters_edge(code, params, "NMS-1", 12, 3.0, batch,
                                    13, block_frames=blk, mode="bf16")
            )
        c_sch = np.asarray(fused_counters_edge_compact(
            code, params, "NMS-1", 12, 3.0, batch, 13, block_frames=blk,
            mode="bf16", schedule=sched,
        ))
        d = abs(c_sch[1] - one[blk][1])
        budget = 3 + c_sch[5]  # overflowed frames are judged early by design
        check(f"mc compact{sched}@{blk} same-seed",
              d <= budget and c_sch[0] == batch,
              f"d_frame_err={d:.0f} overflow={c_sch[5]:.0f}")

    # --- sharded fused step on a 1-device TPU mesh: the shard_map bridge
    # must reproduce the direct fused kernel EXACTLY (same seeds -> same
    # in-kernel PRNG streams; device_seeds(s, i, 1) == single-device seed) ---
    from short_ldpc_decoding_osd_tpu.parallel import (
        device_seeds,
        make_mesh,
        sharded_fused_mc_step,
    )

    mesh1 = make_mesh(1)
    with mesh1:
        step = sharded_fused_mc_step(
            code, "NMS-1", 12, 3.0, per_device_batch=4096, mesh=mesh1,
            base_seed=5,
        )
        c_shard, _ = step(params, jax.random.PRNGKey(0), 0)
    s0 = int(device_seeds(5, 0, 1)[0])
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import (
        auto_block_frames as edge_auto,
    )

    dc = int(code.h.sum(axis=1).max())
    cblock = edge_auto(code.m, code.n, dc,
                       compact_frac=DEFAULT_COMPACT_SCHEDULE[0][1])
    while cblock >= 8 and 4096 % cblock:
        cblock //= 2
    c_direct = np.asarray(fused_counters_edge_compact(
        code, params, "NMS-1", 12, 3.0, 4096, s0,
        t1=4, block_frames=cblock, schedule=DEFAULT_COMPACT_SCHEDULE,
    ))
    check("sharded fused == direct (1-dev mesh, same seed)",
          np.array_equal(np.asarray(c_shard), c_direct[:5]),
          f"shard={np.asarray(c_shard)[:3]} direct={c_direct[:3]}")

    print("ALL PASS" if not failures else f"FAILURES: {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
