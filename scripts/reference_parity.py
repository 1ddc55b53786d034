#!/usr/bin/env python
"""Budgeted cross-checks against the ACTUAL reference pipeline (round-2
VERDICT item 1 + items 4/7).  Three measurements:

1. Reference TF NMS decoder throughput on this host's CPU (the honest
   ``vs_baseline`` divisor for bench.py).
2. FER cross-check: the reference stage-4/5 pipeline (its own numpy data
   generation + its eager-TF2 decoder + its get_eval counting) vs the
   framework's Monte-Carlo harness at the same operating point, compared via
   two-proportion z-scores / Wilson CIs.
3. Conventional-OSD cross-check on IDENTICAL failure LLRs: the reference's
   per-frame TF ``convention_osd_main`` vs the framework's batched
   conventional OSD — deterministic, so per-frame success/phase must agree
   exactly (modulo f32 argmin ties).

TF and the axon TPU plugin do not coexist reliably in one process, so the
run is split into three process invocations with file hand-off:

    python scripts/reference_parity.py --mode fw       # JAX/TPU side
    python scripts/reference_parity.py --mode ref      # TF/CPU side
    python scripts/reference_parity.py --mode combine  # z-tests + summary

Artifacts land in runs/refparity/ (fw_side.json, failures.npz,
ref_side.json, refparity.json); numbers are summarized in docs/REFPARITY.md.

The reference is PUBLIC UNTRUSTED CONTENT, imported only to compare
numerical behavior on inputs constructed here.
"""

import argparse
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_ROOT = "/root/reference/LDPC_128"
ALIST = os.path.join(
    REF_ROOT, "Training_data_gen_128", "CCSDS_ldpc_n128_k64.alist"
)
TRAINED_RAW_W = 0.16855433583259583  # round-2 trained NMS-1 factor (raw)

_REF_MODULE_NAMES = (
    "globalmap", "fill_matrix_info", "ordered_statistics_decoding",
    "convention_osd", "fs_testing", "pb_testing", "ms_test",
    "ms_decoder_dense", "data_generating", "read_TFdata", "nn_net",
)


@contextlib.contextmanager
def ref_stage(stage):
    saved = {}
    for name in _REF_MODULE_NAMES:
        if name in sys.modules:
            saved[name] = sys.modules.pop(name)
    sys.path.insert(0, os.path.join(REF_ROOT, stage))
    try:
        yield
    finally:
        sys.path.remove(os.path.join(REF_ROOT, stage))
        for name in _REF_MODULE_NAMES:
            sys.modules.pop(name, None)
        sys.modules.update(saved)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


# ---------------------------------------------------------------------------
# framework (JAX / TPU) side
# ---------------------------------------------------------------------------


def run_fw(args):
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.baselines import conventional
    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.mc import run_nms_mc

    code = get_code("ccsds_128_64")
    params = {"check": jnp.asarray([TRAINED_RAW_W], jnp.float32)}
    out = {"snrs": [float(s) for s in args.snrs.split(",")], "points": []}

    for snr in out["snrs"]:
        t0 = time.time()
        stats, _ = run_nms_mc(
            code, params, "NMS-1", 12, snr, batch=args.fw_batch,
            error_budget=10**9, max_frames=args.fw_frames, seed=101,
        )
        out["points"].append({
            "snr_db": snr,
            "frames": stats.frames,
            "frame_errors": stats.frame_errors,
            "detected": stats.detected_failures,
            "undetected": stats.undetected_errors,
            "fer": stats.fer,
            "fer_ci": list(stats.fer_confidence()),
            "time_s": time.time() - t0,
        })
        log(f"fw snr {snr}: FER {stats.fer:.5f} over {stats.frames} frames")

    # failure capture + framework conventional OSD for the hand-off
    stats, fb = run_nms_mc(
        code, params, "NMS-1", 12, args.osd_snr, batch=4096,
        error_budget=args.osd_failures * 40, max_frames=10**7, seed=7,
        capture_failures=True, capture_limit=args.osd_failures,
    )
    llr = fb.trajectories[: args.osd_failures, 0]
    labels = fb.labels[: args.osd_failures]
    fw = conventional.conventional_osd(
        jnp.asarray(llr), jnp.asarray(labels), code.g, code.k, order_limit=3
    )
    np.savez_compressed(
        os.path.join(args.out_dir, "failures.npz"),
        llr=llr, labels=labels,
        fw_success=np.asarray(fw["success"]),
        fw_phase=np.asarray(fw["phase"]),
        fw_num_teps=np.asarray(fw["num_teps"]),
        osd_snr=args.osd_snr,
    )
    with open(os.path.join(args.out_dir, "fw_side.json"), "wt") as fh:
        json.dump(out, fh, indent=1)
    log(f"fw side done -> {args.out_dir}/fw_side.json + failures.npz")


# ---------------------------------------------------------------------------
# reference (TF / CPU) side
# ---------------------------------------------------------------------------


def build_ref_decoder(rc, num_iterations=12, raw_w=TRAINED_RAW_W):
    with ref_stage("Ldpc_128_testing"):
        import globalmap as GL

        GL.set_map("selected_decoder_type", "NMS-1")
        GL.set_map("num_iterations", num_iterations)
        GL.set_map("code_parameters", rc)
        import tensorflow as tf

        import ms_test

        layer = ms_test.Decoder_Layer()
        warm = tf.constant(np.ones((8, rc.check_matrix_column), np.float32))
        _ = layer(warm, tf.constant(np.zeros((8, rc.check_matrix_column), np.int64)))
        layer.shared_check_weight.assign([raw_w])
        return layer, tf


def ref_throughput(layer, tf, rc, batch=1024, reps=3):
    rng = np.random.default_rng(0)
    llr = tf.constant(
        rng.normal(1.0, 0.84, (batch, rc.check_matrix_column)).astype(np.float32)
    )
    lab = tf.constant(np.zeros((batch, rc.check_matrix_column), np.int64))
    _ = layer(llr, lab)  # warm
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = layer(llr, lab)
        _ = np.asarray(outs[-1])
        best = max(best, batch / (time.perf_counter() - t0))
    return best


def ref_fer_point(layer, tf, rc, snr_db, frames, batch=1024, seed=11):
    """Reference-semantics FER: its fixed-sigma data generation
    (Testing_data_gen_128/data_generating.py:13-51, raw-sample LLR proxy)
    + its decoder + its get_eval counting (ms_test.py:36-54)."""
    rng = np.random.default_rng(seed)
    n, k = rc.check_matrix_column, rc.k
    sigma = np.sqrt(1.0 / (2.0 * (k / n) * 10 ** (snr_db / 10.0)))
    g = rc.G % 2
    frame_err = detected = undetected = done = 0
    while done < frames:
        b = min(batch, frames - done)
        msgs = rng.integers(0, 2, (b, k))
        words = msgs @ g % 2
        noise = rng.normal(1.0, sigma, (b, n))
        llr = np.where(words == 0, noise, -noise).astype(np.float32)
        outs = layer(tf.constant(llr), tf.constant(words.astype(np.int64)))
        hard = (np.asarray(outs[-1]) <= 0).astype(np.int64)
        err = (hard != words).any(axis=1)
        synd = (hard @ rc.H.T % 2).any(axis=1)
        frame_err += int(err.sum())
        detected += int(synd.sum())
        undetected += int((err & ~synd).sum())
        done += b
    return {
        "frames": done,
        "frame_errors": frame_err,
        "detected": detected,
        "undetected": undetected,
        "fer": frame_err / done,
    }


def ref_conventional(failures_path):
    blob = np.load(failures_path)
    llr, labels = blob["llr"], blob["labels"]
    with ref_stage("FS_OSD"):
        import fill_matrix_info as fs_fill
        import globalmap as GL

        fs_code = fs_fill.Code(
            os.path.join(REF_ROOT, "FS_OSD", "CCSDS_ldpc_n128_k64.alist")
        )
        GL.set_map("code_parameters", fs_code)
        import tensorflow as tf

        import convention_osd as cnv
        import fs_testing

        teps = cnv.generate_teps(3)
        boundaries = cnv.query_boundary(3)
        succ = np.zeros(len(llr), bool)
        phase = np.full(len(llr), -1)
        num_teps = 0
        for i in range(len(llr)):
            upd_in, upd_lab, red_g = fs_testing.swapped_info(
                tf.constant(llr[i]), tf.constant(labels[i].astype(np.int64))
            )
            ok, teps_size, ph = cnv.convention_osd_main(
                (upd_in, upd_lab, red_g, teps, boundaries)
            )
            succ[i] = bool(ok)
            phase[i] = ph
            num_teps = int(teps_size)
    return succ, phase, num_teps


def run_throughput(args):
    """Re-measure ONLY the reference TF2 throughput (quiet host) and patch
    it into ref_side.json — the FER points are load-insensitive but the
    throughput divisor is not; measure it with nothing else running."""
    with ref_stage("Training_data_gen_128"):
        import fill_matrix_info

        rc = fill_matrix_info.Code(ALIST)
    layer, tf = build_ref_decoder(rc)
    rate = ref_throughput(layer, tf, rc, reps=5)
    log(f"reference TF2 throughput (quiet host): {rate:,.1f} cw/s")
    path = os.path.join(args.out_dir, "ref_side.json")
    with open(path) as fh:
        out = json.load(fh)
    out["ref_tf_codewords_per_s_cpu"] = rate
    with open(path, "wt") as fh:
        json.dump(out, fh, indent=1)
    log(f"patched {path}")


def run_ref(args):
    with ref_stage("Training_data_gen_128"):
        import fill_matrix_info

        rc = fill_matrix_info.Code(ALIST)

    layer, tf = build_ref_decoder(rc)
    out = {"trained_raw_check_weight": TRAINED_RAW_W}
    out["ref_tf_codewords_per_s_cpu"] = ref_throughput(layer, tf, rc)
    log(f"reference TF2 throughput: {out['ref_tf_codewords_per_s_cpu']:,.1f} cw/s")

    out["points"] = []
    for snr in (float(s) for s in args.snrs.split(",")):
        t0 = time.time()
        p = ref_fer_point(layer, tf, rc, snr, args.ref_frames)
        p["snr_db"] = snr
        p["time_s"] = time.time() - t0
        out["points"].append(p)
        log(f"ref snr {snr}: FER {p['fer']:.5f} over {p['frames']} frames "
            f"({p['time_s']:.0f}s)")

    failures = os.path.join(args.out_dir, "failures.npz")
    if os.path.exists(failures):
        t0 = time.time()
        succ, phase, num_teps = ref_conventional(failures)
        out["conventional"] = {
            "success": succ.tolist(),
            "phase": phase.tolist(),
            "num_teps": num_teps,
            "time_s": time.time() - t0,
        }
        log(f"ref conventional OSD: {int(succ.sum())}/{len(succ)} success "
            f"({out['conventional']['time_s']:.0f}s)")
    with open(os.path.join(args.out_dir, "ref_side.json"), "wt") as fh:
        json.dump(out, fh, indent=1)
    log(f"ref side done -> {args.out_dir}/ref_side.json")


# ---------------------------------------------------------------------------
# production sliding-walk cross-check (round-3 VERDICT item 1 / next item 3):
# the framework's vectorized phase-2 walk vs the reference's own serial
# ``sliding_osd`` on IDENTICAL captured failures, with the framework's
# decoding path, DIA refinement and stopper weights injected.  Deterministic
# given those inputs -> per-frame S/F, window-count and TEP-complexity must
# agree (tolerance only on float ties near the stopper margin / min ties).
# Ref: DL_OSD_Testing_serial/ordered_statistics_decoding.py:141-220,
#      nn_testing.py:159-256.
# ---------------------------------------------------------------------------


def run_fw_walk(args):
    from short_ldpc_decoding_osd_tpu.cli.main import _setup_compile_cache

    _setup_compile_cache()  # one cache policy with the CLI

    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.mc import run_nms_mc
    from short_ldpc_decoding_osd_tpu.models import (
        canonical_dia_name,
        make_dia,
        stopper_engine_params,
    )
    from short_ldpc_decoding_osd_tpu.osd import engine, segments
    from short_ldpc_decoding_osd_tpu.pipeline.recipe import RunDir

    run = RunDir(args.walk_run)
    # the walk's operating point comes from the RUN's config — hardcoding
    # it here would either crash on a non-default --window (stopper weight
    # shapes) or silently cross-check the WRONG operating point
    cfg = run.load_json("config.json")
    if cfg.get("code_name", "ccsds_128_64") != "ccsds_128_64":
        raise SystemExit(
            "walk parity supports flagship ccsds_128_64 run dirs only "
            "(the reference side loads the CCSDS alist)"
        )
    code = get_code(cfg.get("code_name", "ccsds_128_64"))
    variant = cfg.get("variant", "NMS-1")
    dia_name = canonical_dia_name(cfg.get("dia_model", "model_cnn"))
    window = int(cfg.get("window", 5))
    soft_margin = float(cfg.get("soft_margin", 0.9))
    threshold_sum = int(cfg.get("threshold_sum", 3))
    num_iters = int(cfg.get("num_iterations", 12))
    nms_params = run.load_pickle("nms_params.pkl")
    dia_params = run.load_pickle(f"dia_{dia_name}.pkl")
    s_params = run.load_pickle("stopper_params.pkl")
    path = run.load_json("decoding_path.json")["path"]

    stats, fb = run_nms_mc(
        code, nms_params, variant, num_iters, args.osd_snr, batch=4096,
        error_budget=args.walk_frames * 40, max_frames=10**7, seed=909,
        capture_failures=True, capture_limit=args.walk_frames,
    )
    traj = fb.trajectories[: args.walk_frames]
    labels = fb.labels[: args.walk_frames]
    log(f"captured {len(traj)} failures at {args.osd_snr} dB")

    model = make_dia(dia_name, code.n, num_iters + 1)
    blocks, acc = segments.build_tep_blocks(
        path, code.k, int(cfg.get("num_segments", 6))
    )
    teps, mask, bounds = segments.pack_tep_chunks(blocks)
    fcn = stopper_engine_params(s_params)
    osd_step = engine.make_dl_osd_step(
        model, code.h_osd, code.k, window=window, soft_margin=soft_margin,
        bounds=bounds,
    )
    out, refined = osd_step(
        dia_params, jnp.asarray(traj, jnp.float32),
        jnp.asarray(labels, jnp.int32), jnp.asarray(teps), jnp.asarray(mask),
        jnp.asarray(acc, jnp.int32), fcn,
    )
    np.savez_compressed(
        os.path.join(args.out_dir, "walk_failures.npz"),
        traj=traj.astype(np.float32), labels=labels,
        refined=np.asarray(refined, np.float32),
        teps=np.concatenate(blocks).astype(np.int8),
        block_sizes=np.asarray([len(b) for b in blocks], np.int64),
        acc=np.asarray(acc, np.int64),
        w1=np.asarray(fcn["w1"], np.float32),
        w2=np.asarray(fcn["w2"], np.float32),
        window=window, soft_margin=soft_margin,
        threshold_sum=threshold_sum, num_iterations=num_iters,
        fw_success=np.asarray(out["success"]),
        fw_strict=np.asarray(out["strict_success"]),
        fw_window_num=np.asarray(out["window_num"]),
        fw_complexity=np.asarray(out["complexity"]),
        fw_global_min=np.asarray(out["global_min"], np.float64),
        fw_truth=np.asarray(
            engine.prepare(refined, jnp.asarray(traj[:, 0]),
                           jnp.asarray(labels, jnp.int32),
                           jnp.asarray(code.h_osd), code.k).truth_discrepancy,
            np.float64,
        ),
    )
    log(f"fw walk done -> {args.out_dir}/walk_failures.npz "
        f"(success {int(np.asarray(out['success']).sum())}/{len(traj)})")


def run_ref_walk(args):
    blob = np.load(os.path.join(args.out_dir, "walk_failures.npz"))
    traj, labels, refined = blob["traj"], blob["labels"], blob["refined"]
    sizes = blob["block_sizes"]
    teps_flat = blob["teps"].astype(np.int64)
    teps_list = np.split(teps_flat, np.cumsum(sizes)[:-1])
    acc = blob["acc"]
    w1, w2 = blob["w1"], blob["w2"]
    n_frames, list_length, n = traj.shape

    with ref_stage("Training_data_gen_128"):
        import fill_matrix_info

        rc = fill_matrix_info.Code(ALIST)

    with ref_stage("DL_OSD_Testing_serial"):
        import globalmap as GL

        GL.set_map("code_parameters", rc)
        GL.set_map("num_iterations", int(blob["num_iterations"]))
        GL.set_map("threshold_sum", int(blob["threshold_sum"]))
        GL.set_map("sliding_win_width", int(blob["window"]))
        GL.set_map("soft_margin", float(blob["soft_margin"]))
        import ordered_statistics_decoding as ref_osd_mod
        import tensorflow as tf

        ref_osd = ref_osd_mod.osd(rc)
        tw1 = tf.constant(w1)
        tw2 = tf.constant(w2)

        def fcn(x):
            # the framework-trained Predict_outlier_light: two bias-free
            # dense layers, softmax head (nn_net.py:136-148)
            return tf.nn.softmax(
                tf.matmul(tf.matmul(tf.cast(x, tf.float32), tw1), tw2)
            )

        succ = np.zeros(n_frames, np.int64)
        win_num = np.zeros(n_frames, np.int64)
        cplx = np.zeros(n_frames, np.int64)
        t0 = time.time()
        for i in range(n_frames):
            s, f, w, c = ref_osd.sliding_osd(
                fcn,
                tf.constant(traj[i]),  # (T+1, n) rows for ONE frame
                tf.constant(refined[i : i + 1]),
                tf.constant(labels[i : i + 1].astype(np.int64)),
                (teps_list, acc),
            )
            succ[i], win_num[i], cplx[i] = int(s), int(w), int(c)
        print()
        log(f"ref walk: {int(succ.sum())}/{n_frames} success "
            f"({time.time()-t0:.0f}s)")
    with open(os.path.join(args.out_dir, "ref_walk.json"), "wt") as fh:
        json.dump({
            "success": succ.tolist(),
            "window_num": win_num.tolist(),
            "complexity": cplx.tolist(),
        }, fh, indent=1)
    log(f"ref walk done -> {args.out_dir}/ref_walk.json")


def run_combine_walk(args):
    blob = np.load(os.path.join(args.out_dir, "walk_failures.npz"))
    with open(os.path.join(args.out_dir, "ref_walk.json")) as fh:
        ref = json.load(fh)
    fw_s = blob["fw_success"].astype(bool)
    fw_w = blob["fw_window_num"].astype(np.int64)
    fw_c = blob["fw_complexity"].astype(np.int64)
    ref_s = np.asarray(ref["success"], bool)
    ref_w = np.asarray(ref["window_num"], np.int64)
    ref_c = np.asarray(ref["complexity"], np.int64)
    n = len(fw_s)
    dis_s = np.nonzero(fw_s != ref_s)[0]
    dis_w = np.nonzero(fw_w != ref_w)[0]
    dis_c = np.nonzero(fw_c != ref_c)[0]
    # float-tie analysis for any S/F disagreement: the reference judges
    # success by exact f32 equality global_min == truth; the framework uses
    # a relative tolerance — disagreements within that band are reduction-
    # order ties, not semantic differences
    ties = []
    for i in dis_s:
        gap = abs(blob["fw_global_min"][i] - blob["fw_truth"][i])
        rel = gap / max(blob["fw_truth"][i], 1.0)
        ties.append({"frame": int(i), "rel_gap": float(rel)})
    out = {
        "frames": int(n),
        "fw_success": int(fw_s.sum()),
        "ref_success": int(ref_s.sum()),
        "success_disagreements": int(len(dis_s)),
        "window_num_disagreements": int(len(dis_w)),
        "complexity_disagreements": int(len(dis_c)),
        "total_windows": {"fw": int(fw_w.sum()), "ref": int(ref_w.sum())},
        "total_teps": {"fw": int(fw_c.sum()), "ref": int(ref_c.sum())},
        "success_tie_analysis": ties,
        "disagreement_frames": {
            "success": dis_s.tolist(),
            "window_num": dis_w.tolist()[:50],
            "complexity": dis_c.tolist()[:50],
        },
    }
    path = os.path.join(args.out_dir, "walkparity.json")
    with open(path, "wt") as fh:
        json.dump(out, fh, indent=1)
    log(json.dumps({k: out[k] for k in (
        "frames", "fw_success", "ref_success", "success_disagreements",
        "window_num_disagreements", "complexity_disagreements",
        "total_windows", "total_teps")}))
    log(f"wrote {path}")


# ---------------------------------------------------------------------------
# FS-OSD / PB-OSD search-loop cross-check (round-4 VERDICT item 1): the
# framework's batched FS/PB searches vs the reference's own serial loops on
# IDENTICAL captured failure LLRs.  Three modes with file hand-off:
#
#   fw-base   JAX side: run batched fs_osd (intended + literal tau_e
#             semantics) and pb_osd on a captured failure set
#   ref-base  TF side: (a) an instrumented per-frame loop that drives the
#             reference's OWN functions (swapped_info / one_tep_compare /
#             acquire_pnc_boundary / optimal_tep_sequence / the PB
#             probability stops) with exactly the reference's control flow,
#             recording per-frame outcomes; (b) the actual fs_osd/pb_osd
#             entry points on a prefix of the same frames, with their
#             printed aggregates parsed and checked against (a)
#   combine-base  per-frame agreement + quantified divergence table
#
# Ref: FS_OSD/fs_testing.py:68-231, PB_OSD/pb_testing.py:44-229,339-500.
# ---------------------------------------------------------------------------


def _load_base_failures(args):
    """(llr, labels) for the baseline cross-check: trajectories[:,0] of a
    captured NMS failure set (stage-5 failure semantics)."""
    blob = np.load(args.base_failures)
    llr = blob["traj"][: args.base_frames, 0].astype(np.float32)
    labels = np.asarray(blob["labels"][: args.base_frames], np.int64)
    return llr, labels


def run_fw_base(args):
    from short_ldpc_decoding_osd_tpu.cli.main import _setup_compile_cache

    _setup_compile_cache()

    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.baselines import fs_osd, pb_osd
    from short_ldpc_decoding_osd_tpu.codes import get_code

    code = get_code("ccsds_128_64")
    llr, labels = _load_base_failures(args)
    log(f"fw-base: {len(llr)} frames from {args.base_failures}")
    jl, jb = jnp.asarray(llr), jnp.asarray(labels)

    t0 = time.time()
    fs_int = fs_osd.fs_osd(jl, jb, code.g, code.k, order_limit=3, beta=0.1,
                           d_min=14, tau_psc=30, score_tau_e_codeword=True)
    fs_lit = fs_osd.fs_osd(jl, jb, code.g, code.k, order_limit=3, beta=0.1,
                           d_min=14, tau_psc=30, score_tau_e_codeword=False)
    log(f"fw FS done ({time.time()-t0:.1f}s): intended "
        f"{int(np.asarray(fs_int['success']).sum())}/{len(llr)}, literal "
        f"{int(np.asarray(fs_lit['success']).sum())}/{len(llr)}")
    t0 = time.time()
    pb = pb_osd.pb_osd(jl, jb, code.g, code.k, snr_db=args.osd_snr,
                       order_limit=3)
    log(f"fw PB done ({time.time()-t0:.1f}s): "
        f"{int(np.asarray(pb['success']).sum())}/{len(llr)}, avg cost "
        f"{float(np.asarray(pb['num_teps']).mean()):.1f}")

    fs_stop = np.where(
        np.asarray(fs_int["zero_stop"]), 0,
        np.where(np.asarray(fs_int["tau_e_stop"]), 1,
                 np.where(np.asarray(fs_int["gate_stop"]), 2, 3)))
    pb_stop = np.where(
        np.asarray(pb["stopped_by_suc"]), 1,
        np.where(np.asarray(pb["stopped_by_pro"]), 2, 0))
    np.savez_compressed(
        os.path.join(args.out_dir, "base_failures.npz"),
        llr=llr, labels=labels, osd_snr=args.osd_snr,
        fs_success_intended=np.asarray(fs_int["success"]),
        fs_success_literal=np.asarray(fs_lit["success"]),
        fs_num_teps=np.asarray(fs_int["num_teps"]),
        fs_num_teps_literal=np.asarray(fs_lit["num_teps"]),
        fs_stop=fs_stop,  # 0 zero / 1 tau_e / 2 gate / 3 exhaust
        pb_success=np.asarray(pb["success"]),
        pb_cost=np.asarray(pb["num_teps"]),
        pb_stop=pb_stop,  # 1 suc / 2 pro / 0 exhaust
        pb_maintained=np.asarray(pb["maintained_list"]),
        pb_suc_evals=np.asarray(pb["suc_evals"]),
        pb_improvements=np.asarray(pb["improvements"]),
        pb_n_max=int(pb["n_max"]),
    )
    log(f"fw-base done -> {args.out_dir}/base_failures.npz")


class _FrameDS:
    """Minimal stand-in for the reference's TFRecord dataset: yields
    (features[1, n], label[1, n]) numpy pairs, matching the
    ``input_list[i][0][0]`` indexing in fs_osd/pb_osd."""

    def __init__(self, llr, labels):
        self._items = [
            (llr[i][None, :], labels[i][None, :]) for i in range(len(llr))
        ]

    def as_numpy_iterator(self):
        return iter(self._items)


def _parse_sf(text):
    """Last '----> S:<s> F:<f>' occurrence in a captured stdout/log blob."""
    import re

    hits = re.findall(r"----> S:\s*(\d+)\s*F:\s*(\d+)", text)
    return (int(hits[-1][0]), int(hits[-1][1])) if hits else None


def run_ref_base(args):
    import io
    import math

    blob = np.load(os.path.join(args.out_dir, "base_failures.npz"))
    llr, labels = blob["llr"], blob["labels"]
    n_frames = len(llr)
    out = {"frames": n_frames, "osd_snr": float(blob["osd_snr"])}

    if args.which in ("fs", "both"):
        out["fs"] = _ref_fs_instrumented(llr, labels, args)
        out["fs_entry"] = _ref_fs_entrypoint(llr, labels, args)
    if args.which in ("pb", "both"):
        out["pb"] = _ref_pb_instrumented(
            llr, labels, float(blob["osd_snr"]), args,
            fw_cost=blob["pb_cost"])
        out["pb_entry"] = _ref_pb_entrypoint(
            llr, labels, float(blob["osd_snr"]), args,
            fw_cost=blob["pb_cost"])
    suffix = "" if args.which == "both" else f"_{args.which}"
    path = os.path.join(args.out_dir, f"ref_base{suffix}.json")
    with open(path, "wt") as fh:
        json.dump(out, fh, indent=1)
    log(f"ref-base done -> {path}")


def _ref_fs_instrumented(llr, labels, args):
    """Drive the reference's own FS-OSD building blocks with exactly the
    fs_osd control flow (fs_testing.py:129-176), per frame, recording:
    success under the literal line-162 scoring AND under the intended
    optimal_list scoring, TEP count, and which stop fired."""
    import math

    n_frames = len(llr)
    with ref_stage("FS_OSD"):
        import fill_matrix_info
        import globalmap as GL

        code = fill_matrix_info.Code(
            os.path.join(REF_ROOT, "FS_OSD", "CCSDS_ldpc_n128_k64.alist"))
        GL.set_map("code_parameters", code)
        GL.set_map("order_limit", 3)
        import tensorflow as tf

        import fs_testing

        n, k = code.check_matrix_column, code.k
        beta, d_min, tau_psc = 0.1, 14, 30
        tau_e = math.floor(d_min - 1) / 2
        tep_matrix_list = fs_testing.generate_sequential_teps(k, 3)
        rows = {"success_literal": [], "success_intended": [],
                "num_teps": [], "stop": []}
        t0 = time.time()
        for i in range(n_frames):
            upd_in, upd_lab, red_g = fs_testing.swapped_info(
                tf.constant(llr[i]), tf.constant(labels[i]))
            boundary_list = fs_testing.acquire_pnc_boundary(upd_in)
            early, optimal_codeword, w_dmin = fs_testing.one_tep_compare(
                upd_in, [0] * k, red_g, tau_e)
            num_teps = 1
            chosen = optimal_codeword  # what optimal_list would hold
            stop = "zero" if early else None
            if not early:
                s_low = [x + beta * (n - k) for x in boundary_list]
                early_jumping = False
                for j in range(3):
                    if s_low[j] < w_dmin:
                        for nth_tep in tep_matrix_list[j]:
                            num_teps += 1
                            e1, new_cw, new_wd = fs_testing.one_tep_compare(
                                upd_in, nth_tep, red_g, tau_e)
                            if e1:
                                # fs_testing.py:143-147: appends new_cw but
                                # breaks BEFORE updating optimal_codeword
                                chosen = new_cw
                                early_jumping = True
                                stop = "tau_e"
                                break
                            e2, _, _ = fs_testing.one_tep_compare(
                                upd_in, nth_tep, red_g, tau_psc)
                            if e2 and new_wd < w_dmin:
                                w_dmin = new_wd
                                optimal_codeword = new_cw
                                chosen = new_cw
                        if early_jumping:
                            break
                    else:
                        stop = "gate"
                        break
                if stop is None:
                    stop = "exhaust"
                if stop in ("gate", "exhaust"):
                    chosen = optimal_codeword
            lab32 = tf.cast(upd_lab, tf.int32)
            lit = int(tf.reduce_sum(
                tf.abs(optimal_codeword - lab32)).numpy()) == 0
            intended = int(tf.reduce_sum(
                tf.abs(chosen - lab32)).numpy()) == 0
            rows["success_literal"].append(lit)
            rows["success_intended"].append(intended)
            rows["num_teps"].append(int(num_teps))
            rows["stop"].append(stop)
            if (i + 1) % 25 == 0:
                log(f"  ref FS frame {i+1}/{n_frames} "
                    f"({time.time()-t0:.0f}s)")
        log(f"ref FS instrumented: "
            f"{sum(rows['success_literal'])}/{n_frames} literal, "
            f"{sum(rows['success_intended'])}/{n_frames} intended, "
            f"avg TEPs {np.mean(rows['num_teps']):.1f} "
            f"({time.time()-t0:.0f}s)")
        rows["time_s"] = time.time() - t0
        return rows


def _ref_fs_entrypoint(llr, labels, args):
    """Call the reference's ACTUAL fs_osd() on the first --entry-frames
    frames and parse its printed S/F aggregate (fs_testing.py:195-212)."""
    import io
    from contextlib import redirect_stdout

    m = min(args.entry_frames, len(llr))
    with ref_stage("FS_OSD"):
        import fill_matrix_info
        import globalmap as GL

        code = fill_matrix_info.Code(
            os.path.join(REF_ROOT, "FS_OSD", "CCSDS_ldpc_n128_k64.alist"))
        GL.set_map("code_parameters", code)
        GL.set_map("order_limit", 3)
        GL.set_map("miracle_view", False)
        GL.set_map("convention_osd", False)
        GL.set_map("fs_osd", True)
        GL.set_map("d_min", 14)
        GL.set_map("tau_psc", 30)
        GL.set_map("termination_num_threshlod", 10 ** 9)
        import fs_testing

        ds = _FrameDS(llr[:m], labels[:m])
        cwd = os.getcwd()
        os.chdir(args.out_dir)  # its ./log lands in the artifact dir
        buf = io.StringIO()
        t0 = time.time()
        try:
            with redirect_stdout(buf):
                fs_testing.fs_osd(float(args.osd_snr), 0.1, ds)
        finally:
            os.chdir(cwd)
        sf = _parse_sf(buf.getvalue())
        log(f"ref FS entrypoint on {m} frames: S/F {sf} "
            f"({time.time()-t0:.0f}s)")
        return {"frames": m, "s_f": sf}


def _ref_pb_instrumented(llr, labels, snr, args, fw_cost):
    """Drive the reference's own PB-OSD machinery (pb_testing.py:100-161)
    per frame: its swapped_info, its dynamic priority list
    (optimal_tep_sequence), its probability stops.  Pops are capped at
    --pb-pop-cap (frames the batched side says run to N_max would take
    ~minutes each in eager TF); capped frames are recorded as censored."""
    n_frames = len(llr)
    with ref_stage("PB_OSD"):
        import fill_matrix_info
        import globalmap as GL

        code = fill_matrix_info.Code(
            os.path.join(REF_ROOT, "PB_OSD", "CCSDS_ldpc_n128_k64.alist"))
        GL.set_map("code_parameters", code)
        GL.set_map("order_limit", 3)
        import tensorflow as tf

        import pb_testing as pb

        k = code.k
        noise_variance = 1.0 / (10 ** (snr / 10))
        rows = {"success": [], "cost": [], "stop": [], "maintained": [],
                "suc1": [], "suc2": [], "capped": []}
        t0 = time.time()
        for i in range(n_frames):
            upd_in, upd_lab, red_g = pb.swapped_info(
                tf.constant(llr[i]), tf.constant(labels[i]))
            hard = tf.cast(tf.where(upd_in > 0, 0, 1), tf.int32)
            optimal = tf.matmul(tf.reshape(hard[:k], [1, -1]), red_g) % 2
            hd = (optimal + hard) % 2
            w_dmin = tf.reduce_sum(tf.cast(hd, tf.float32) * tf.abs(upd_in))
            tep_matrix = pb.create_binary_tensor(k, k - 1)
            p1 = pb.mean_lrb_prob(noise_variance, upd_in)
            para_list = [p1, 0.5]
            pt = pb.mean_mrb_prob(noise_variance, upd_in)
            p_t_suc, p_t_pro, n_max = pb.calculate_two_thresholds(pt)
            spl = pb.com_mrb_prob(noise_variance, upd_in)
            memory = suc1 = suc2 = 0
            cost = None
            stop = "exhaust"
            cap = min(n_max - 1, args.pb_pop_cap)
            for j in range(cap):
                tep_matrix, sel_tep, cmp_cnt = pb.optimal_tep_sequence(
                    upd_in, tep_matrix)
                memory += int(cmp_cnt)
                wrapped = (sel_tep, noise_variance, upd_in, spl, w_dmin,
                           para_list)
                p_e_pro = pb.acquire_prob_promising(wrapped)
                if p_e_pro < p_t_pro:
                    stop = "pro"
                    cost = j + 1
                    break
                mrb_c = (hard[:k] + sel_tep) % 2
                cand = tf.matmul(tf.reshape(mrb_c, [1, -1]), red_g) % 2
                hd_c = (cand + hard) % 2
                w_de = tf.reduce_sum(
                    tf.cast(hd_c, tf.float32) * tf.abs(upd_in))
                suc1 += 1
                if w_de < w_dmin:
                    optimal = cand
                    w_dmin = w_de
                    p_e_suc = pb.acquire_p_e_suc(
                        noise_variance, upd_in, spl, tf.squeeze(hd_c))
                    suc2 += 1
                    if p_e_suc > p_t_suc:
                        stop = "suc"
                        cost = j + 1
                        break
            capped = cost is None and cap < n_max - 1
            if cost is None:
                cost = int(n_max) if not capped else cap
            ok = int(tf.reduce_sum(tf.abs(
                optimal - tf.cast(upd_lab, tf.int32))).numpy()) == 0
            rows["success"].append(ok)
            rows["cost"].append(int(cost))
            rows["stop"].append(stop if not capped else "capped")
            rows["maintained"].append(int(memory))
            rows["suc1"].append(int(suc1))
            rows["suc2"].append(int(suc2))
            rows["capped"].append(bool(capped))
            if (i + 1) % 25 == 0:
                log(f"  ref PB frame {i+1}/{n_frames} "
                    f"({time.time()-t0:.0f}s)")
        log(f"ref PB instrumented: {sum(rows['success'])}/{n_frames}, "
            f"avg cost {np.mean(rows['cost']):.1f}, "
            f"capped {sum(rows['capped'])} ({time.time()-t0:.0f}s)")
        rows["time_s"] = time.time() - t0
        return rows


def _ref_pb_entrypoint(llr, labels, snr, args, fw_cost):
    """Call the reference's ACTUAL pb_osd() on an early-stopping prefix and
    parse its printed S/F aggregate.  The prefix is the first
    --entry-frames frames whose fw-side cost is under the pop cap (a frame
    the batched search says full-traverses would take ~7 min each in the
    eager loop); the instrumented loop covers every frame regardless."""
    import io
    from contextlib import redirect_stdout

    keep = np.nonzero(fw_cost[: len(llr)] <= args.pb_pop_cap)[0][
        : args.entry_frames]
    with ref_stage("PB_OSD"):
        import fill_matrix_info
        import globalmap as GL

        code = fill_matrix_info.Code(
            os.path.join(REF_ROOT, "PB_OSD", "CCSDS_ldpc_n128_k64.alist"))
        GL.set_map("code_parameters", code)
        GL.set_map("order_limit", 3)
        GL.set_map("miracle_view", False)
        GL.set_map("convention_osd", False)
        GL.set_map("pb_osd", True)
        GL.set_map("termination_num_threshlod", 10 ** 9)
        import pb_testing as pb

        ds = _FrameDS(llr[keep], labels[keep])
        cwd = os.getcwd()
        os.chdir(args.out_dir)
        buf = io.StringIO()
        t0 = time.time()
        try:
            with redirect_stdout(buf):
                pb.pb_osd(float(snr), ds)
        finally:
            os.chdir(cwd)
        sf = _parse_sf(buf.getvalue())
        log(f"ref PB entrypoint on {len(keep)} frames: S/F {sf} "
            f"({time.time()-t0:.0f}s)")
        return {"frames": int(len(keep)), "indices": keep.tolist(),
                "s_f": sf}


def run_combine_base(args):
    blob = np.load(os.path.join(args.out_dir, "base_failures.npz"))
    ref = {}
    for suffix in ("", "_fs", "_pb"):
        p = os.path.join(args.out_dir, f"ref_base{suffix}.json")
        if os.path.exists(p):
            with open(p) as fh:
                ref.update(json.load(fh))
    n = int(len(blob["llr"]))
    out = {"frames": n, "osd_snr": float(blob["osd_snr"])}

    if "fs" in ref:
        rs = ref["fs"]
        stop_names = np.asarray(["zero", "tau_e", "gate", "exhaust"])
        fw_stop = stop_names[blob["fs_stop"]]
        ref_stop_v = np.asarray(rs["stop"])
        fw_lit = blob["fs_success_literal"].astype(bool)
        fw_int = blob["fs_success_intended"].astype(bool)
        ref_lit = np.asarray(rs["success_literal"], bool)
        ref_int = np.asarray(rs["success_intended"], bool)
        fw_teps = blob["fs_num_teps"].astype(np.int64)
        ref_teps = np.asarray(rs["num_teps"], np.int64)
        dis = {
            "literal_success": np.nonzero(fw_lit != ref_lit)[0],
            "intended_success": np.nonzero(fw_int != ref_int)[0],
            "num_teps": np.nonzero(fw_teps != ref_teps)[0],
            "stop_kind": np.nonzero(fw_stop != ref_stop_v)[0],
        }
        out["fs"] = {
            "frames": n,
            "fw_success_intended": int(fw_int.sum()),
            "ref_success_intended": int(ref_int.sum()),
            "fw_success_literal": int(fw_lit.sum()),
            "ref_success_literal": int(ref_lit.sum()),
            "avg_teps": {"fw": float(fw_teps.mean()),
                         "ref": float(ref_teps.mean())},
            "disagreements": {k: int(len(v)) for k, v in dis.items()},
            "disagreement_frames": {k: v.tolist()[:50]
                                    for k, v in dis.items()},
            "literal_vs_intended_delta_frames": int(
                (ref_lit != ref_int).sum()),
            "tau_e_mid_search_frames": int((ref_stop_v == "tau_e").sum()),
            "stop_hist_ref": {s: int((ref_stop_v == s).sum())
                              for s in stop_names},
            "entrypoint_check": _check_entry_fs(ref, rs),
        }
        log(f"FS combine: {json.dumps(out['fs']['disagreements'])} "
            f"avg TEPs fw {fw_teps.mean():.1f} ref {ref_teps.mean():.1f}")

    if "pb" in ref:
        rs = ref["pb"]
        stop_names_pb = np.asarray(["exhaust", "suc", "pro"])
        fw_stop = stop_names_pb[blob["pb_stop"]]
        ref_stop_v = np.asarray(rs["stop"])
        capped = np.asarray(rs["capped"], bool)
        fw_s = blob["pb_success"].astype(bool)
        ref_s = np.asarray(rs["success"], bool)
        fw_c = blob["pb_cost"].astype(np.int64)
        ref_c = np.asarray(rs["cost"], np.int64)
        fw_m = blob["pb_maintained"].astype(np.int64)
        ref_m = np.asarray(rs["maintained"], np.int64)
        fw_s1 = blob["pb_suc_evals"].astype(np.int64)
        ref_s1 = np.asarray(rs["suc1"], np.int64)
        fw_s2 = blob["pb_improvements"].astype(np.int64)
        ref_s2 = np.asarray(rs["suc2"], np.int64)
        live = ~capped
        # success on a capped frame is censoring, not divergence: the eager
        # reference loop stopped at the pop cap while the batched search ran
        # to its true stop (observed: frame with fw cost 17,723 vs cap 4096)
        dis = {
            "success": np.nonzero(live & (fw_s != ref_s))[0],
            "success_censored": np.nonzero(capped & (fw_s != ref_s))[0],
            "cost": np.nonzero(live & (fw_c != ref_c))[0],
            "stop_kind": np.nonzero(live & (fw_stop != ref_stop_v))[0],
            "maintained": np.nonzero(live & (fw_m != ref_m))[0],
            "suc_evals": np.nonzero(live & (fw_s1 != ref_s1))[0],
            "improvements": np.nonzero(live & (fw_s2 != ref_s2))[0],
        }
        out["pb"] = {
            "frames": n,
            "capped_frames": int(capped.sum()),
            "fw_success": int(fw_s.sum()),
            "ref_success": int(ref_s.sum()),
            "avg_cost_live": {"fw": float(fw_c[live].mean()),
                              "ref": float(ref_c[live].mean())},
            "avg_maintained_live": {"fw": float(fw_m[live].mean()),
                                    "ref": float(ref_m[live].mean())},
            "disagreements": {k: int(len(v)) for k, v in dis.items()},
            "disagreement_frames": {k: v.tolist()[:50]
                                    for k, v in dis.items()},
            "stop_hist_ref": {s: int((ref_stop_v == s).sum())
                              for s in ["suc", "pro", "exhaust", "capped"]},
            "entrypoint_check": _check_entry_pb(ref, rs),
        }
        log(f"PB combine: {json.dumps(out['pb']['disagreements'])} "
            f"avg cost fw {fw_c[live].mean():.1f} ref {ref_c[live].mean():.1f}")

    path = os.path.join(args.out_dir, "baseparity.json")
    with open(path, "wt") as fh:
        json.dump(out, fh, indent=1)
    log(f"wrote {path}")


def _check_entry_fs(ref, rows):
    """Entry-point aggregate (the reference's own fs_osd prints) vs the
    instrumented loop's aggregate on the same prefix."""
    ent = ref.get("fs_entry")
    if not ent or not ent.get("s_f"):
        return None
    m = ent["frames"]
    s = sum(rows["success_literal"][:m])
    return {"frames": m, "entry_s_f": ent["s_f"],
            "instrumented_s_f": [s, m - s],
            "match": list(ent["s_f"]) == [s, m - s]}


def _check_entry_pb(ref, rows):
    ent = ref.get("pb_entry")
    if not ent or not ent.get("s_f"):
        return None
    idx = ent["indices"]
    s = sum(rows["success"][i] for i in idx)
    return {"frames": len(idx), "entry_s_f": ent["s_f"],
            "instrumented_s_f": [s, len(idx) - s],
            "match": list(ent["s_f"]) == [s, len(idx) - s]}


# ---------------------------------------------------------------------------
# combine
# ---------------------------------------------------------------------------


def two_proportion_z(k1, n1, k2, n2):
    p = (k1 + k2) / (n1 + n2)
    se = np.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
    return ((k1 / n1) - (k2 / n2)) / max(se, 1e-300)


def wilson(k, n, z=1.96):
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    d = 1 + z * z / n
    c = p + z * z / (2 * n)
    h = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return ((c - h) / d, (c + h) / d)


def run_combine(args):
    with open(os.path.join(args.out_dir, "fw_side.json")) as fh:
        fw = json.load(fh)
    with open(os.path.join(args.out_dir, "ref_side.json")) as fh:
        ref = json.load(fh)
    results = {
        "trained_raw_check_weight": ref["trained_raw_check_weight"],
        "ref_tf_codewords_per_s_cpu": ref["ref_tf_codewords_per_s_cpu"],
        "fer_crosscheck": [],
    }
    for rp, fp in zip(ref["points"], fw["points"]):
        assert rp["snr_db"] == fp["snr_db"]
        z = two_proportion_z(
            rp["frame_errors"], rp["frames"], fp["frame_errors"], fp["frames"]
        )
        zd = two_proportion_z(
            rp["detected"], rp["frames"], fp["detected"], fp["frames"]
        )
        results["fer_crosscheck"].append({
            "snr_db": rp["snr_db"],
            "ref": rp | {"fer_ci": list(wilson(rp["frame_errors"], rp["frames"]))},
            "fw": fp,
            "z_fer": float(z),
            "z_detected_fer": float(zd),
        })
        log(f"snr {rp['snr_db']}: ref FER {rp['fer']:.5f} vs fw "
            f"{fp['fer']:.5f} -> z = {z:+.2f} (detected z = {zd:+.2f})")
    if "conventional" in ref:
        blob = np.load(os.path.join(args.out_dir, "failures.npz"))
        ref_succ = np.asarray(ref["conventional"]["success"], bool)
        ref_phase = np.asarray(ref["conventional"]["phase"])
        fw_succ = blob["fw_success"]
        fw_phase = blob["fw_phase"]
        agree = ref_succ == fw_succ
        pa = ref_phase[ref_succ & agree] == fw_phase[ref_succ & agree]
        results["conventional_osd_crosscheck"] = {
            "frames": int(len(fw_succ)),
            "osd_snr": float(blob["osd_snr"]),
            "ref_success": int(ref_succ.sum()),
            "fw_success": int(fw_succ.sum()),
            "success_disagreements": int((~agree).sum()),
            "phase_disagreements": int((~pa).sum()),
            "ref_num_teps": int(ref["conventional"]["num_teps"]),
            "fw_num_teps": int(blob["fw_num_teps"]),
        }
        log(f"conventional OSD cross-check: "
            f"{results['conventional_osd_crosscheck']}")
    out = os.path.join(args.out_dir, "refparity.json")
    with open(out, "wt") as fh:
        json.dump(results, fh, indent=1)
    log(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode",
        choices=["fw", "ref", "combine", "throughput",
                 "fw-walk", "ref-walk", "combine-walk",
                 "fw-base", "ref-base", "combine-base"],
        required=True,
    )
    ap.add_argument("--out-dir", default="runs/refparity")
    ap.add_argument("--ref-frames", type=int, default=40960)
    ap.add_argument("--fw-frames", type=int, default=2**21)
    ap.add_argument("--fw-batch", type=int, default=2**21)  # the bench shape: compile-cached; fresh compact-kernel shapes can compile pathologically slowly under axon
    ap.add_argument("--snrs", default="2.5,3.0,3.5")
    ap.add_argument("--osd-snr", type=float, default=3.0)
    ap.add_argument("--osd-failures", type=int, default=96)
    ap.add_argument("--walk-run", default="runs/r4_pipeline",
                    help="run dir with trained NMS/DIA/stopper + path")
    ap.add_argument("--walk-frames", type=int, default=128)
    ap.add_argument("--base-failures",
                    default="runs/r4_baselines/baseline_failures_3.00dB.npz")
    ap.add_argument("--base-frames", type=int, default=256)
    ap.add_argument("--entry-frames", type=int, default=32,
                    help="frames fed to the actual fs_osd/pb_osd entry points")
    ap.add_argument("--pb-pop-cap", type=int, default=4096,
                    help="pop cap for the eager reference PB loop")
    ap.add_argument("--which", choices=["fs", "pb", "both"], default="both")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    {"fw": run_fw, "ref": run_ref, "combine": run_combine,
     "throughput": run_throughput, "fw-walk": run_fw_walk,
     "ref-walk": run_ref_walk, "combine-walk": run_combine_walk,
     "fw-base": run_fw_base, "ref-base": run_ref_base,
     "combine-base": run_combine_base}[args.mode](args)


if __name__ == "__main__":
    main()
