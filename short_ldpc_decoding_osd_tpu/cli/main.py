"""One CLI replacing the reference's per-stage ``Main_*.py`` scripts with
hard-coded ``sys.argv`` (SURVEY.md §5 config row).

Subcommands:
  train-nms     stage 1+2: train an NMS variant
  eval-nms      stage 4+5: Monte-Carlo FER at SNR points (+failure capture)
  train-dia     stage 3a: DIA refiner + decoding path
  train-stopper stage 3b: sliding-window stopper
  sweep         stages 1-7 end-to-end (two-phase FER curve)
  baseline      FS-OSD / PB-OSD / conventional OSD / miracle view
  bench         one-chip throughput microbenchmark
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _add_common(p):
    p.add_argument("--code", default="ccsds_128_64")
    p.add_argument("--variant", default="NMS-1")
    p.add_argument("--iterations", type=int, default=12)
    p.add_argument("--run-dir", default="./runs/default")
    p.add_argument("--seed", type=int, default=0)


# every advertised choice resolves through models.canonical_dia_name; a test
# walks all of them through make_dia (the r3 CLI advertised rnn_one/rnn_two
# but the registry only knew model_rnn1/model_rnn2 — KeyError minutes into a
# sweep)
DIA_MODEL_CHOICES = ["model_cnn", "cnn", "model_rnn1", "rnn_one", "rnn1",
                     "model_rnn2", "rnn_two", "rnn2"]


def _add_dia_model(p):
    p.add_argument("--dia-model", default="model_cnn",
                   choices=DIA_MODEL_CHOICES)


def _add_osd_point(p):
    """Stage-6 operating point (reference defaults,
    ``DL_OSD_Testing_serial/globalmap.py:49-55``)."""
    p.add_argument("--threshold-sum", type=int, default=3,
                   help="max order-pattern weight on the decoding path "
                        "(~OSD order)")
    p.add_argument("--decoding-length", type=int, default=30,
                   help="max order patterns on the decoding path")
    p.add_argument("--window", type=int, default=5,
                   help="sliding stopper window width (block minima)")
    p.add_argument("--soft-margin", type=float, default=0.9,
                   help="stopper P[stop] threshold in (0, 1)")
    p.add_argument("--segments", type=int, default=6,
                   help="MRB reliability segments for order patterns")


def _osd_point_kwargs(args) -> dict:
    if not 0.0 < args.soft_margin < 1.0:
        raise SystemExit(f"--soft-margin must be in (0, 1), got {args.soft_margin}")
    if args.window < 1 or args.window > args.decoding_length:
        raise SystemExit(
            f"--window must be in [1, --decoding-length], got {args.window} "
            f"vs {args.decoding_length}")
    if args.threshold_sum < 0 or args.segments < 1:
        raise SystemExit("--threshold-sum must be >= 0 and --segments >= 1")
    return {
        "threshold_sum": args.threshold_sum,
        "decoding_length": args.decoding_length,
        "window": args.window,
        "soft_margin": args.soft_margin,
        "num_segments": args.segments,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sldpc", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train-nms", help="train the NMS decoder")
    _add_common(p)
    p.add_argument("--snr", type=float, default=2.7)
    p.add_argument("--snr-hi", type=float, default=None)
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--batch", type=int, default=100)

    p = sub.add_parser("eval-nms", help="Monte-Carlo NMS FER at SNR points")
    _add_common(p)
    p.add_argument("--snrs", default="2.0:3.0:6")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--error-budget", type=int, default=40000)
    p.add_argument("--max-frames", type=int, default=10**8)
    p.add_argument("--channel", choices=["awgn", "rayleigh"], default="awgn",
                   help="rayleigh = block fading (reference stage-4 option, "
                        "Testing_data_gen_128/data_generating.py:21-38)")
    p.add_argument("--fade-duration", type=int, default=1,
                   help="fading block length in bits (rayleigh only)")

    for name, hlp in (
        ("train-dia", "stage 3a: DIA refiner + learned decoding path"),
        ("train-stopper", "stage 3b: sliding-window stopper (implies 3a)"),
    ):
        p = sub.add_parser(name, help=hlp)
        _add_common(p)
        p.add_argument("--training-snr", type=float, default=2.7)
        _add_dia_model(p)
        _add_osd_point(p)
        p.add_argument("--train-failures", type=int, default=20000)
        p.add_argument("--batch", type=int, default=4096)

    p = sub.add_parser("sweep", help="full two-phase pipeline + FER curve")
    _add_common(p)
    p.add_argument("--snrs", default="2.0:3.0:6")
    p.add_argument("--training-snr", type=float, default=2.7)
    _add_dia_model(p)
    _add_osd_point(p)
    p.add_argument("--osd-budget", type=int, default=500)
    p.add_argument("--nms-budget", type=int, default=40000)
    p.add_argument("--train-failures", type=int, default=20000)
    p.add_argument("--max-frames", type=int, default=10**8)
    p.add_argument("--frame-portions", default=None,
                   help="comma-separated per-SNR-point fractions of "
                        "--max-frames, low -> high SNR (reference "
                        "portion_dis, Testing_data_gen_128/Main_test.py:"
                        "90-106), e.g. 0.05,0.075,0.2,0.5,0.75,1.0")

    p = sub.add_parser("baseline", help="run an OSD baseline on NMS failures")
    _add_common(p)
    p.add_argument("--kind", choices=["fs", "pb", "conventional", "miracle"],
                   required=True)
    p.add_argument("--snrs", default="2.0:3.0:6")
    p.add_argument("--order", type=int, default=3)
    p.add_argument("--beta", type=float, default=0.1)
    p.add_argument("--d-min", type=int, default=14)
    p.add_argument("--tau-psc", type=int, default=30)
    p.add_argument("--failure-budget", type=int, default=100)
    p.add_argument("--batch", type=int, default=4096)

    p = sub.add_parser("bench", help="one-chip NMS throughput")
    _add_common(p)
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--snr", type=float, default=3.0)

    args = ap.parse_args(argv)
    return _dispatch(args)


def _parse_snrs(spec: str):
    lo, hi, num = spec.split(":")
    return np.linspace(float(lo), float(hi), int(num))


def _banner(args):
    """Decoder-selection banner (reference ``display_selection.py:9-14``)."""
    import os

    print(f"My pid: {os.getpid()}")
    if getattr(args, "variant", "") == "SPA":
        print("Using Sum-Product Algorithm")
    else:
        print("Using one of Min-Sum variants")


def _setup_compile_cache():
    """Point JAX's persistent compilation cache at the repo cache (or
    ``SLDPC_JAX_CACHE``): first-compile of the large-batch capture step is
    ~6 min on v5e, a cache load ~30 s."""
    import os
    import pathlib

    import jax

    cache = os.environ.get("SLDPC_JAX_CACHE")
    if cache is None:
        cache = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass  # older jax or read-only fs: run uncached


def _dispatch(args):
    _setup_compile_cache()
    from ..codes import get_code
    from ..pipeline.recipe import RecipeConfig, RunDir, run_recipe, stage_train_nms

    if args.cmd in ("train-nms", "eval-nms", "sweep"):
        _banner(args)

    if args.cmd == "train-nms":
        from ..train import NMSTrainConfig, train_nms

        code = get_code(args.code)
        cfg = NMSTrainConfig(
            variant=args.variant,
            num_iterations=args.iterations,
            snr_lo=args.snr,
            snr_hi=args.snr_hi if args.snr_hi is not None else args.snr,
            batch=args.batch,
            termination_step=args.steps,
            seed=args.seed,
        )
        run = RunDir(args.run_dir)
        params, summary = train_nms(
            code, cfg, ckpt_dir=run.path("ckpt_nms"),
            log_fn=lambda r: print(
                f"step {r['step']} loss {r['loss']:.2f} fer {r['fer']:.4f}"
            ),
        )
        run.save_pickle("nms_params.pkl", params)
        print(json.dumps(summary["params"]))
        return 0

    if args.cmd == "eval-nms":
        from ..channel import ChannelSpec
        from ..mc import run_nms_mc
        from ..ops import nms as nms_ops

        code = get_code(args.code)
        run = RunDir(args.run_dir)
        if run.has("nms_params.pkl"):
            params = run.load_pickle("nms_params.pkl")
        else:
            print("no trained params in run dir; using init factor 0.67")
            params = nms_ops.init_params(args.variant, code.h)
        points = []
        for snr in _parse_snrs(args.snrs):
            spec = (
                ChannelSpec.rayleigh_spec(float(snr), code.rate,
                                          duration=args.fade_duration)
                if args.channel == "rayleigh"
                else None  # harness builds the AWGN spec
            )
            stats, _ = run_nms_mc(
                code, params, args.variant, args.iterations, float(snr),
                batch=args.batch, error_budget=args.error_budget,
                max_frames=args.max_frames, seed=args.seed, spec=spec,
            )
            lo, hi = stats.fer_confidence()
            point = {"snr_db": float(snr), **stats.to_dict(), "fer_ci": [lo, hi]}
            points.append(point)
            print(json.dumps(point))
        run.save_json("nms_fer.json", {"points": points})
        return 0

    if args.cmd == "sweep":
        from ..models import canonical_dia_name

        cfg = RecipeConfig(
            code_name=args.code,
            variant=args.variant,
            num_iterations=args.iterations,
            training_snr=args.training_snr,
            dia_model=canonical_dia_name(args.dia_model),
            **_osd_point_kwargs(args),
            nms_error_budget=args.nms_budget,
            osd_failure_budget=args.osd_budget,
            train_failure_target=args.train_failures,
            max_frames_per_snr=args.max_frames,
            frame_portions=(
                tuple(float(x) for x in args.frame_portions.split(","))
                if args.frame_portions
                else ()
            ),
            seed=args.seed,
        )
        curve = run_recipe(cfg, args.run_dir, _parse_snrs(args.snrs))
        print(json.dumps(curve["points"][-1]))
        return 0

    if args.cmd in ("train-dia", "train-stopper"):
        from ..ops import nms as nms_ops
        from ..pipeline.recipe import (
            stage_harvest_failures,
            stage_train_dia_and_path,
            stage_train_stopper,
        )

        from ..models import canonical_dia_name

        code = get_code(args.code)
        run = RunDir(args.run_dir)
        cfg = RecipeConfig(
            code_name=args.code,
            variant=args.variant,
            num_iterations=args.iterations,
            training_snr=args.training_snr,
            dia_model=canonical_dia_name(args.dia_model),
            **_osd_point_kwargs(args),
            train_failure_target=args.train_failures,
            eval_batch=args.batch,
            seed=args.seed,
        )
        if run.has("nms_params.pkl"):
            nms_params = run.load_pickle("nms_params.pkl")
        else:
            print("no trained params in run dir; using init factor 0.67")
            nms_params = nms_ops.init_params(args.variant, code.h)
        fb = stage_harvest_failures(cfg, run, nms_params)
        model, dia_params, path = stage_train_dia_and_path(cfg, run, fb)
        out = {"decoding_path_len": len(path)}
        if args.cmd == "train-stopper":
            stage_train_stopper(cfg, run, model, dia_params, fb, path)
            out["stopper"] = "stopper_params.pkl"
        print(json.dumps(out))
        return 0

    if args.cmd == "baseline":
        return _run_baseline(args)

    if args.cmd == "bench":
        import os

        os.environ["BENCH_BATCH"] = str(args.batch)
        os.environ["BENCH_SNR"] = str(args.snr)
        import importlib.util
        import pathlib

        bench_path = pathlib.Path(__file__).resolve().parents[2] / "bench.py"
        spec = importlib.util.spec_from_file_location("bench", bench_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        return 0
    raise SystemExit(f"unknown command {args.cmd}")


def _baseline_failures(args, code, params, run, snr):
    """One NMS failure capture per (run dir, SNR), shared across the four
    ``baseline --kind`` invocations: the standard fs/pb/conventional/miracle
    comparison is judged on the SAME failure set and pays the capture sweep
    once instead of 4x."""
    from ..mc import run_nms_mc
    from ..mc.harness import FailureBatch

    key = {
        "snr_db": round(float(snr), 4),
        "seed": args.seed,
        "batch": args.batch,
        "failure_budget": args.failure_budget,
        "variant": args.variant,
        "iterations": args.iterations,
        # without these, retraining NMS (or switching --code) in the same
        # run dir would silently reuse failures captured under a DIFFERENT
        # decoder/code
        "code": code.name,
        # list-of-lists (not tuples): the key must survive a JSON round trip
        "params": [
            [k2, np.round(np.asarray(params[k2]), 7).tolist()]
            for k2 in sorted(params)
        ],
    }
    tag = f"baseline_failures_{float(snr):.2f}dB"
    if run.has(tag + ".json"):
        meta = run.load_json(tag + ".json")
        if meta.get("key") == key:
            blob = np.load(run.path(tag + ".npz"))
            fb = FailureBatch(blob["traj"], blob["labels"], int(blob["overflow"]))
            return meta["fer_nms"], fb
    stats, fb = run_nms_mc(
        code, params, args.variant, args.iterations, float(snr),
        batch=args.batch, error_budget=args.failure_budget * 40,
        max_frames=10**7, seed=args.seed, capture_failures=True,
        capture_limit=args.failure_budget * 4,
    )
    fer_nms = stats.detected_failures / max(stats.frames, 1)
    np.savez_compressed(
        run.path(tag + ".npz"),
        traj=fb.trajectories, labels=fb.labels, overflow=fb.overflow,
    )
    run.save_json(tag + ".json", {"key": key, "fer_nms": fer_nms,
                                  "stats": stats.to_dict()})
    return fer_nms, fb


def _run_baseline(args):
    """NMS failures -> one of the G-domain baselines, per SNR point."""
    import jax.numpy as jnp

    from ..baselines import conventional, fs_osd, pb_osd
    from ..codes import get_code
    from ..ops import nms as nms_ops
    from ..pipeline.recipe import RunDir

    code = get_code(args.code)
    run = RunDir(args.run_dir)
    params = (
        run.load_pickle("nms_params.pkl")
        if run.has("nms_params.pkl")
        else nms_ops.init_params(args.variant, code.h)
    )
    results = []
    for snr in _parse_snrs(args.snrs):
        fer_nms, fb = _baseline_failures(args, code, params, run, snr)
        traj = fb.trajectories
        if not len(traj):
            results.append({"snr_db": float(snr), "note": "no failures"})
            continue
        n_use = min(len(traj), args.failure_budget * 2)
        llr = jnp.asarray(traj[:n_use, 0])
        labels = jnp.asarray(fb.labels[:n_use])
        if args.kind == "miracle":
            counter = conventional.miracle_view(llr, labels, code.g, code.k)
            out = {
                "snr_db": float(snr),
                "hist": dict(sorted(counter.items())),
                "floor_order3": conventional.miracle_fer_floor(counter, 3),
            }
        elif args.kind == "conventional":
            res = conventional.conventional_osd(
                llr, labels, code.g, code.k, order_limit=args.order
            )
            succ = np.asarray(res["success"])
            out = {
                "snr_db": float(snr),
                "success": int(succ.sum()),
                "fail": int((~succ).sum()),
                "fer_osd": float((~succ).mean()),
                "num_teps": int(res["num_teps"]),
            }
        elif args.kind == "fs":
            res = fs_osd.fs_osd(
                llr, labels, code.g, code.k, order_limit=args.order,
                beta=args.beta, d_min=args.d_min, tau_psc=args.tau_psc,
            )
            succ = np.asarray(res["success"])
            out = {
                "snr_db": float(snr),
                "success": int(succ.sum()),
                "fail": int((~succ).sum()),
                "fer_osd": float((~succ).mean()),
                "avg_teps": float(np.asarray(res["num_teps"]).mean()),
            }
        else:  # pb
            res = pb_osd.pb_osd(
                llr, labels, code.g, code.k, snr_db=float(snr),
                order_limit=args.order,
            )
            succ = np.asarray(res["success"])
            out = {
                "snr_db": float(snr),
                "success": int(succ.sum()),
                "fail": int((~succ).sum()),
                "fer_osd": float((~succ).mean()),
                "avg_teps": float(np.asarray(res["num_teps"]).mean()),
                "suc_evals": float(np.asarray(res["suc_evals"]).mean()),
                # reference "Maintained_list" metric (pb_testing.py:196-209)
                "maintained_list": float(
                    np.asarray(res["maintained_list"]).mean()
                ),
            }
        out["fer_nms"] = fer_nms
        if "fer_osd" in out:
            out["fer_total"] = out["fer_nms"] * out["fer_osd"]
        results.append(out)
        print(json.dumps(out))
    run.save_json(f"baseline_{args.kind}.json", {"points": results})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
