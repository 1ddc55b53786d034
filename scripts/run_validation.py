#!/usr/bin/env python
"""Validation driver: Pallas kernel check + full two-phase recipe on the
real TPU, with persistent compile cache.  Artifacts -> runs/<tag>.

Usage: python scripts/run_validation.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def pallas_check_and_perf():
    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.ops import nms
    from short_ldpc_decoding_osd_tpu.ops.nms_pallas import decode_final_pallas

    code = get_code("ccsds_128_64")
    h = jnp.asarray(code.h, jnp.float32)
    params = nms.init_params("NMS-1")
    B = 16384
    rng = np.random.default_rng(0)
    llr = jnp.asarray(rng.normal(1.0, 0.7, (B, 128)), jnp.float32)

    log("compiling pallas kernel (block=32)...")
    t0 = time.time()
    got = decode_final_pallas(params, h, llr, 12, "NMS-1", block_frames=32)
    jax.block_until_ready(got)
    log(f"pallas compile+run {time.time()-t0:.1f}s")

    log("compiling xla decode_final...")
    t0 = time.time()
    want = jax.jit(lambda x: nms.decode_final(params, h, x, 12, "NMS-1"))(llr)
    jax.block_until_ready(want)
    log(f"xla compile+run {time.time()-t0:.1f}s")

    err = float(jnp.max(jnp.abs(got - want)))
    rel = err / (float(jnp.max(jnp.abs(want))) + 1e-9)
    log(f"pallas-vs-xla maxerr {err:.3e} (rel {rel:.3e})")

    def timeit(f, reps=20):
        out = f(llr)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = f(llr)
        jax.block_until_ready(out)
        return reps * B / (time.time() - t0)

    r_pallas = timeit(lambda x: decode_final_pallas(params, h, x, 12, "NMS-1", block_frames=32))
    r_xla = timeit(jax.jit(lambda x: nms.decode_final(params, h, x, 12, "NMS-1")))
    log(f"throughput: pallas {r_pallas:,.0f} cw/s | xla {r_xla:,.0f} cw/s")
    return {"pallas_cw_s": r_pallas, "xla_cw_s": r_xla, "maxerr": err}


def monotonicity_report(points) -> dict:
    """FER_total must not increase with SNR beyond CI noise (r4 VERDICT
    weak #2: the r4 curve had a knee inversion from OSD budget noise).
    Flags every adjacent inversion and whether it sits inside the
    fer_total_ci overlap."""
    pts = sorted(points, key=lambda p: p["snr_db"])
    inversions = []
    for a, b in zip(pts, pts[1:]):
        if b["fer_total"] > a["fer_total"]:
            ci_a = a.get("fer_total_ci")
            ci_b = b.get("fer_total_ci")
            within_ci = bool(
                ci_a and ci_b and ci_b[0] <= ci_a[1]  # intervals overlap
            )
            inversions.append({
                "snr_from": a["snr_db"], "snr_to": b["snr_db"],
                "fer_from": a["fer_total"], "fer_to": b["fer_total"],
                "within_ci_overlap": within_ci,
            })
    return {
        "monotonic": not inversions,
        "inversions": inversions,
        "all_within_ci": all(i["within_ci_overlap"] for i in inversions),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--publication", action="store_true",
        help="publication budgets: >=5000 OSD failures/point so the knee "
             "is not binomial-noise-bound (r4 VERDICT item 3)",
    )
    ap.add_argument("--skip-pallas", action="store_true")
    ap.add_argument("--run-dir", default="runs/validation")
    args = ap.parse_args()

    results = {}
    if not args.skip_pallas:
        try:
            results["pallas"] = pallas_check_and_perf()
        except Exception as e:
            log(f"pallas check failed: {e}")
            results["pallas"] = {"error": str(e)[:300]}

    from short_ldpc_decoding_osd_tpu.pipeline.recipe import RecipeConfig, run_recipe

    if args.quick:
        cfg = RecipeConfig(
            nms_error_budget=2000,
            osd_failure_budget=200,
            train_failure_target=4000,
            max_frames_per_snr=2_000_000,
            eval_batch=8192,
        )
        snrs = [2.0, 2.5, 3.0, 3.5]
    elif args.publication:
        cfg = RecipeConfig(
            nms_error_budget=40_000,
            osd_failure_budget=5000,
            train_failure_target=20_000,
            max_frames_per_snr=60_000_000,
            eval_batch=8192,
        )
        snrs = [2.0, 2.2, 2.4, 2.6, 2.8, 3.0, 3.25, 3.5]
    else:
        cfg = RecipeConfig(
            nms_error_budget=40_000,
            osd_failure_budget=500,
            train_failure_target=20_000,
            max_frames_per_snr=30_000_000,
            eval_batch=8192,
        )
        snrs = [2.0, 2.2, 2.4, 2.6, 2.8, 3.0, 3.25, 3.5]
    t0 = time.time()
    curve = run_recipe(cfg, args.run_dir, snrs, log=log)
    results["curve"] = curve["points"]
    results["elapsed_s"] = time.time() - t0
    results["monotonicity"] = monotonicity_report(curve["points"])
    log(json.dumps(results["monotonicity"]))
    with open(os.path.join(args.run_dir, "validation_summary.json"), "wt") as fh:
        json.dump(results, fh, indent=1, default=str)
    log("DONE")
    log(json.dumps(results.get("pallas", {}), default=str))


if __name__ == "__main__":
    main()
