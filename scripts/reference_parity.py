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
                 "fw-walk", "ref-walk", "combine-walk"],
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
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    {"fw": run_fw, "ref": run_ref, "combine": run_combine,
     "throughput": run_throughput, "fw-walk": run_fw_walk,
     "ref-walk": run_ref_walk, "combine-walk": run_combine_walk}[args.mode](args)


if __name__ == "__main__":
    main()
