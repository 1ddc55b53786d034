#!/usr/bin/env python
"""Two-phase (NMS + DIA-OSD) FER under Rayleigh block fading.

The reference's fading option lives in its test-data generator
(``Testing_data_gen_128/data_generating.py:21-38``) and feeds the SAME
stage-5/6 pipeline; this driver does the equivalent system-level run:
capture fading failures with the trained NMS, walk them with the trained
DIA/stopper/path via the fused raw-LLR phase-2 step.  The DIA/stopper are
the AWGN-trained artifacts (as they would be in the reference's flow
unless retrained on fading data) — the artifact records that.

Usage: python scripts/rayleigh_two_phase.py [--run runs/r4_pipeline]
       [--snrs 6.0,8.0,10.0] [--budget 500] [--out runs/r5_rayleigh]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/r4_pipeline")
    ap.add_argument("--snrs", default="6.0,8.0,10.0")
    ap.add_argument("--budget", type=int, default=500)
    ap.add_argument("--fade-duration", type=int, default=1)
    ap.add_argument("--out", default="runs/r5_rayleigh")
    args = ap.parse_args()

    from short_ldpc_decoding_osd_tpu.cli.main import _setup_compile_cache

    _setup_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from short_ldpc_decoding_osd_tpu.channel import ChannelSpec
    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.mc import run_nms_mc
    from short_ldpc_decoding_osd_tpu.models import (
        canonical_dia_name,
        make_dia,
        stopper_engine_params,
    )
    from short_ldpc_decoding_osd_tpu.osd import engine, segments
    from short_ldpc_decoding_osd_tpu.pipeline.recipe import RunDir

    run = RunDir(args.run)
    cfg = run.load_json("config.json")
    code = get_code(cfg.get("code_name", "ccsds_128_64"))
    variant = cfg.get("variant", "NMS-1")
    iters = int(cfg.get("num_iterations", 12))
    dia_name = canonical_dia_name(cfg.get("dia_model", "model_cnn"))
    nms_params = run.load_pickle("nms_params.pkl")
    dia_params = run.load_pickle(f"dia_{dia_name}.pkl")
    fcn = stopper_engine_params(run.load_pickle("stopper_params.pkl"))
    path = run.load_json("decoding_path.json")["path"]
    model = make_dia(dia_name, code.n, iters + 1)
    blocks, acc = segments.build_tep_blocks(
        path, code.k, int(cfg.get("num_segments", 6)))
    teps, mask, bounds = segments.pack_tep_chunks(blocks)
    step = engine.make_dl_osd_step_from_llr(
        model, code, variant, iters, window=int(cfg.get("window", 5)),
        soft_margin=float(cfg.get("soft_margin", 0.9)), bounds=bounds)
    teps_d, mask_d = jnp.asarray(teps), jnp.asarray(mask)
    acc_d = jnp.asarray(acc, jnp.int32)

    os.makedirs(args.out, exist_ok=True)
    points = []
    for snr in (float(s) for s in args.snrs.split(",")):
        t0 = time.time()
        spec = ChannelSpec.rayleigh_spec(
            snr, code.rate, duration=args.fade_duration)
        stats, fb = run_nms_mc(
            code, nms_params, variant, iters, snr, batch=65536,
            error_budget=10 ** 9, max_frames=2 ** 21, seed=515, spec=spec,
            capture_failures=True, capture_limit=args.budget,
            capture_trajectories=False,
        )
        llr = fb.trajectories[: args.budget, 0]
        labels = fb.labels[: args.budget]
        osd_b = len(llr)
        out, _, det = step(
            nms_params, dia_params, jnp.asarray(llr, jnp.float32),
            jnp.asarray(labels, jnp.int32), teps_d, mask_d, acc_d, fcn)
        d = np.asarray(det)
        succ = np.asarray(out["success"]) & d
        nv = int(d.sum())
        fer_nms = stats.detected_failures / max(stats.frames, 1)
        fer_osd = float((nv - succ.sum()) / max(nv, 1))
        point = {
            "snr_db": snr,
            "channel": "rayleigh",
            "fade_block_bits": 16 * args.fade_duration,
            "frames": stats.frames,
            "fer_nms_detected": fer_nms,
            "ufer": stats.ufer,
            "osd_walked": nv,
            "osd_success": int(succ.sum()),
            "fer_osd": fer_osd,
            "fer_total": fer_nms * fer_osd + stats.ufer,
            "dia_training_channel": "awgn (trained artifacts from --run)",
            "time_s": round(time.time() - t0, 1),
        }
        points.append(point)
        print(json.dumps(point), flush=True)
    with open(os.path.join(args.out, "two_phase_rayleigh.json"), "wt") as fh:
        json.dump({"points": points}, fh, indent=1)


if __name__ == "__main__":
    main()
