"""The end-to-end two-phase recipe, replacing the reference's 7 stage
directories + filesystem hand-off ('Training and Testing recipe.txt:7-18').

Stages (artifacts land in a single run directory as json/npz/pickle):

1+2. train the NMS decoder at the training SNR (data generated on device —
     no TFRecord stage needed),
3.   harvest NMS failures at the training SNR, train the DIA refiner, build
     the ratio-normalized order-pattern decoding path, generate stopper
     samples and train the sliding-window stopper,
4+5. per-SNR Monte-Carlo NMS evaluation with failure capture (error-budget
     early stop),
6.   DIA-OSD evaluation of the captured failures per SNR,
7.   FER_total(SNR) = FER_NMS(SNR) * FER_OSD(SNR).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import time

import jax.numpy as jnp
import numpy as np

from ..codes import Code, get_code
from ..mc import harness
from ..models import stopper_engine_params
from ..ops import nms
from ..osd import engine, segments
from ..train import (
    DIATrainConfig,
    NMSTrainConfig,
    StopperTrainConfig,
    generate_stopper_samples,
    pattern_statistics_sweep,
    reform_windows,
    train_dia,
    train_nms,
    train_stopper,
)
from ..utils.metrics import DecodeStats


@dataclasses.dataclass
class RecipeConfig:
    code_name: str = "ccsds_128_64"
    variant: str = "NMS-1"
    num_iterations: int = 12
    training_snr: float = 2.7
    dia_model: str = "model_cnn"
    threshold_sum: int = 3
    decoding_length: int = 30
    window: int = 5
    soft_margin: float = 0.9
    num_segments: int = 6
    # budgets
    nms_error_budget: int = 40_000
    osd_failure_budget: int = 500
    train_failure_target: int = 20_000
    max_frames_per_snr: int = 10**8
    # optional per-SNR-point scaling of max_frames, low -> high SNR
    # (reference portion_dis, ``Testing_data_gen_128/Main_test.py:90-106``)
    frame_portions: tuple = ()
    eval_batch: int = 4096
    # capture-sweep batch; None = auto (large on TPU: the capture step's cost
    # is ~150 ms of dispatch/transfer overhead per step regardless of batch,
    # so big batches amortize it — measured 4.6k f/s at 4096 vs 1.57M f/s at
    # 262144 on v5e via the tunnel)
    capture_batch: int | None = None
    seed: int = 0


def _capture_batch(cfg: "RecipeConfig", code: Code) -> int:
    if cfg.capture_batch is not None:
        return cfg.capture_batch
    import jax

    if jax.default_backend() != "tpu":
        return cfg.eval_batch
    from ..ops.nms_edge_pallas import auto_block_frames as edge_auto
    from ..ops.nms_edge_xla import auto_select as edge_xla_auto

    # size from the DECODING H — extended for ENMS, which can be far
    # larger than the plain H the kernels are gated on
    decode_h = code.extended().h if cfg.variant == "ENMS" else code.h
    import numpy as _np

    h_np = _np.asarray(decode_h)
    m, n = h_np.shape
    dc = int(h_np.sum(axis=1).max())
    if cfg.variant != "NMS-r" and edge_auto(m, n, dc) >= 8:
        # edge-kernel capture: per-frame state is O(n); scale the flagship
        # point (262144 frames at n=128, ~130 MB/step) inversely with n
        auto = max(1024, (262144 * 128 // max(n, 1)) // 1024 * 1024)
        return max(cfg.eval_batch, auto)
    if edge_xla_auto(h_np, cfg.variant):
        # capture rides the edge-layout pure-XLA rung (ops/nms_edge_xla),
        # whose HBM working set is O(dc*m + n) per frame.  The x16 temp
        # factor reproduces the measured (1056,880) compile peak to ~10%:
        # 65536 frames wanted 20.3 GB (OOM), 32768 ran at ~10 GB on the
        # 16 GB part.
        per_frame = (dc * m + n) * 4 * 16
        return max(256, int(8e9 // per_frame) // 256 * 256)
    # no fast rung (NMS-r with irregular degree): capture demotes to the
    # dense decoder, which materializes a (B, m, n) message tensor (plus
    # AD-free copies) — bound B so ~3 such tensors stay under ~1.5 GB (the
    # (1056,880) WiMAX code OOMed HBM at the n-scaled batch:
    # f32[31744,176,1056] = 25.7 GB); round to a 256 granule (1024 rounded
    # large m*n down to 0, and the max(1024, ...) floor then blew past the
    # stated bound for (1056,880))
    dense_bound = int(1.5e9 // max(m * n * 4 * 3, 1)) // 256 * 256
    return max(256, min(cfg.eval_batch, max(dense_bound, 256)))


class RunDir:
    """Tiny artifact store for one pipeline run."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def save_json(self, name: str, obj):
        with open(self.path(name), "wt") as fh:
            json.dump(obj, fh, indent=1, default=str)

    def load_json(self, name: str):
        with open(self.path(name), "rt") as fh:
            return json.load(fh)

    def save_pickle(self, name: str, obj):
        with open(self.path(name), "wb") as fh:
            pickle.dump(obj, fh)

    def load_pickle(self, name: str):
        with open(self.path(name), "rb") as fh:
            return pickle.load(fh)

    def has(self, name: str) -> bool:
        return os.path.exists(self.path(name))


def stage_train_nms(cfg: RecipeConfig, run: RunDir, log=print) -> dict:
    code = get_code(cfg.code_name)
    if run.has("nms_params.pkl"):
        return run.load_pickle("nms_params.pkl")
    t0 = time.time()
    params, summary = train_nms(
        code,
        NMSTrainConfig(
            variant=cfg.variant,
            num_iterations=cfg.num_iterations,
            snr_lo=cfg.training_snr,
            snr_hi=cfg.training_snr,
            seed=cfg.seed,
        ),
        ckpt_dir=run.path("ckpt_nms"),
        log_fn=lambda r: log(f"  nms step {r['step']} loss {r['loss']:.1f} fer {r['fer']:.3f}"),
    )
    run.save_pickle("nms_params.pkl", params)
    run.save_json("nms_train_summary.json", summary | {"elapsed_s": time.time() - t0})
    return params


def stage_harvest_failures(cfg: RecipeConfig, run: RunDir, nms_params, log=print):
    code = get_code(cfg.code_name)
    if run.has("train_failures.npz"):
        blob = np.load(run.path("train_failures.npz"))
        return harness.FailureBatch(blob["traj"], blob["labels"], int(blob["overflow"]))
    stats, fb = harness.run_nms_mc(
        code,
        nms_params,
        cfg.variant,
        cfg.num_iterations,
        cfg.training_snr,
        batch=_capture_batch(cfg, code),
        error_budget=cfg.train_failure_target,
        max_frames=cfg.max_frames_per_snr,
        seed=cfg.seed + 1,
        capture_failures=True,
        capture_limit=cfg.train_failure_target,
    )
    log(
        f"  harvested {len(fb.trajectories)} failures from {stats.frames} frames "
        f"(FER {stats.fer:.3e})"
    )
    # uncompressed: ~130 MB regenerable scratch (gitignored); gzip cost
    # ~25 s of the pipeline's wall time for nothing
    np.savez(
        run.path("train_failures.npz"),
        traj=fb.trajectories,
        labels=fb.labels,
        overflow=fb.overflow,
    )
    run.save_json("train_failures_meta.json", stats.to_dict())
    return fb


def stage_train_dia_and_path(cfg: RecipeConfig, run: RunDir, fb, log=print):
    from ..models import canonical_dia_name

    code = get_code(cfg.code_name)
    model_tag = f"dia_{canonical_dia_name(cfg.dia_model)}"
    op_point = {
        "threshold_sum": cfg.threshold_sum,
        "decoding_length": cfg.decoding_length,
        "num_segments": cfg.num_segments,
    }
    if run.has(model_tag + ".pkl") and run.has("decoding_path.json"):
        blob = run.load_json("decoding_path.json")
        # regenerate when the cached path was built for a DIFFERENT (or
        # unrecorded) operating point — silently reusing e.g. an order-3
        # path after the config moved to order-2 would evaluate the wrong
        # decoder
        if blob.get("operating_point") == op_point:
            dia_params = run.load_pickle(model_tag + ".pkl")
            from ..models import make_dia

            model = make_dia(cfg.dia_model, code.n, cfg.num_iterations + 1)
            return model, dia_params, blob["path"]
        log("  cached decoding path has a different operating point; "
            "regenerating")
    model, dia_params, _ = train_dia(
        code,
        fb.trajectories,
        fb.labels,
        DIATrainConfig(model=cfg.dia_model, seed=cfg.seed),
        # per-model checkpoint dir: a shared one restores e.g. CNN params
        # into an RNN model when the same run dir trains both refiners
        ckpt_dir=run.path(f"ckpt_{model_tag}"),
        log_fn=lambda r: log(f"  dia step {r['step']} loss {r['loss']:.1f}"),
    )
    sweep = pattern_statistics_sweep(
        code, model, dia_params, fb.trajectories, fb.labels,
        num_segments=cfg.num_segments,
    )
    counter = sweep["pattern_counter"]
    counter.save(run.path("pattern_counts.json"))
    decoding_path = counter.decoding_path(cfg.threshold_sum, cfg.decoding_length)
    if [0] * cfg.num_segments not in decoding_path:
        decoding_path = [[0] * cfg.num_segments] + decoding_path[: cfg.decoding_length - 1]
    run.save_json(
        "decoding_path.json",
        {
            "path": decoding_path,
            "operating_point": op_point,
            "hist_initial": dict(sweep["hist_initial"]),
            "hist_final": dict(sweep["hist_final"]),
            "hist_refined": dict(sweep["hist_refined"]),
        },
    )
    run.save_pickle(model_tag + ".pkl", dia_params)
    log(f"  decoding path ({len(decoding_path)} patterns): {decoding_path[:6]}...")
    return model, dia_params, decoding_path


def stage_train_stopper(cfg: RecipeConfig, run: RunDir, model, dia_params, fb,
                        decoding_path, log=print):
    code = get_code(cfg.code_name)
    if run.has("stopper_params.pkl"):
        return run.load_pickle("stopper_params.pkl")
    records, summary = generate_stopper_samples(
        code, model, dia_params, fb.trajectories, fb.labels, decoding_path,
        num_segments=cfg.num_segments,
    )
    run.save_json("stopper_samples_summary.json", summary)
    ins, labs = reform_windows(records, cfg.window)
    _, s_params, val = train_stopper(
        ins, labs, StopperTrainConfig(window=cfg.window, seed=cfg.seed)
    )
    run.save_json("stopper_validation.json", val)
    run.save_pickle("stopper_params.pkl", s_params)
    log(f"  stopper validation: {val}")
    return s_params


def stage_eval_sweep(cfg: RecipeConfig, run: RunDir, nms_params, model, dia_params,
                     s_params, decoding_path, snrs, log=print) -> dict:
    """Stages 4-7: per-SNR NMS eval + DIA-OSD on failures -> total FER."""
    code = get_code(cfg.code_name)
    blocks, acc = segments.build_tep_blocks(decoding_path, code.k, cfg.num_segments)
    teps, mask, bounds = segments.pack_tep_chunks(blocks)
    teps_j, mask_j = jnp.asarray(teps), jnp.asarray(mask)
    h = jnp.asarray(code.h_osd)  # full-rank basis for the OSD elimination
    fcn = stopper_engine_params(s_params)
    # fused llr -> (re-decode, DIA, walk, iteration stats) path: the failure
    # hand-off stays raw (N, n) LLR rows and the trajectory re-decode runs
    # in the VMEM edge kernel — phase-2 chunk 39.7 -> 8.4 ms and ~26x less
    # tunnel transfer per point (r5).  Falls back to the trajectory-capture
    # path off-TPU / for NMS-r (neural check update has no edge kernel).
    import jax

    fused_phase2 = (
        jax.default_backend() == "tpu" and cfg.variant != "NMS-r"
    )
    if fused_phase2:
        osd_step_llr = engine.make_dl_osd_step_from_llr(
            model, code, cfg.variant, cfg.num_iterations,
            window=cfg.window, soft_margin=cfg.soft_margin, bounds=bounds,
            with_iteration_stats=True,
        )
    else:
        osd_step = engine.make_dl_osd_step(
            model, h, code.k, window=cfg.window, soft_margin=cfg.soft_margin,
            bounds=bounds,
        )
    from ..mc.harness import iteration_ber_list, iteration_ce_list
    from ..utils.profiling import JsonlLogger

    jsonl = JsonlLogger(run.path("metrics.jsonl"))
    curve = []
    for idx, snr in enumerate(snrs):
        portion = (
            cfg.frame_portions[min(idx, len(cfg.frame_portions) - 1)]
            if cfg.frame_portions
            else 1.0
        )
        t0 = time.time()
        cap_batch = _capture_batch(cfg, code)
        stats, fb = harness.run_nms_mc(
            code, nms_params, cfg.variant, cfg.num_iterations, float(snr),
            batch=cap_batch,
            error_budget=cfg.nms_error_budget,
            max_frames=max(int(cfg.max_frames_per_snr * portion), cap_batch),
            seed=cfg.seed + int(snr * 100),
            capture_failures=True,
            # 25% headroom over the walk budget (confirm-drop + stats); the
            # old 4x multiplier cost ~100 MB of tunnel transfer per point at
            # publication budgets for rows the walk never consumes
            capture_limit=max(int(cfg.osd_failure_budget * 1.25), 2000),
            capture_trajectories=not fused_phase2,
        )
        nms_time = time.time() - t0
        # stage 6: OSD on (up to budget) captured failures
        t1 = time.time()
        n_osd = min(len(fb.trajectories), cfg.osd_failure_budget)
        osd_stats = {"success": 0, "fail": 0, "complexity": 0, "windows": 0}
        ce_list = []
        ber_list = []
        unconfirmed = 0
        if n_osd and fused_phase2:
            # fused path: raw LLR rows in, everything (re-decode, DIA, walk,
            # CE/BER bookkeeping) on device; rows the bit-exact in-step
            # re-decode does not confirm as detected failures are excluded
            # (same accounting as FailureBatch.mismatches, but two-sided
            # within the walked set: detected flags come from the re-decode)
            osd_b = 4096 if n_osd > 4096 else n_osd
            llr_rows = fb.trajectories[:n_osd, 0]
            lab_rows = fb.labels[:n_osd]
            acc_j = jnp.asarray(acc, jnp.int32)
            cols = {k_: [] for k_ in
                    ("succ", "strict", "cplx", "win", "det", "ce", "ber")}
            for i0 in range(0, n_osd, osd_b):
                hi_i = min(i0 + osd_b, n_osd)
                live = hi_i - i0
                l_c = llr_rows[i0:hi_i]
                b_c = lab_rows[i0:hi_i]
                if live < osd_b:
                    reps = osd_b - live
                    l_c = np.concatenate([l_c, np.tile(l_c[:1], (reps, 1))])
                    b_c = np.concatenate([b_c, np.tile(b_c[:1], (reps, 1))])
                out, _refined, det, (ce_rows, ber_rows) = osd_step_llr(
                    nms_params, dia_params, jnp.asarray(l_c, jnp.float32),
                    jnp.asarray(b_c, jnp.int32), teps_j, mask_j, acc_j, fcn,
                )
                cols["succ"].append(np.asarray(out["success"])[:live])
                cols["strict"].append(np.asarray(out["strict_success"])[:live])
                cols["cplx"].append(np.asarray(out["complexity"])[:live])
                cols["win"].append(np.asarray(out["window_num"])[:live])
                cols["det"].append(np.asarray(det)[:live])
                cols["ce"].append(np.asarray(ce_rows)[:live])
                cols["ber"].append(np.asarray(ber_rows)[:live])
            valid = np.concatenate(cols["det"])
            unconfirmed = int((~valid).sum())
            succ = np.concatenate(cols["succ"])[valid]
            nv = max(int(valid.sum()), 1)
            osd_stats = {
                "success": int(succ.sum()),
                "fail": int((~succ).sum()),
                "strict_success": int(np.concatenate(cols["strict"])[valid].sum()),
                "complexity": float(np.concatenate(cols["cplx"])[valid].mean())
                if valid.any() else 0.0,
                "windows": float(np.concatenate(cols["win"])[valid].mean())
                if valid.any() else 0.0,
            }
            ce_all = np.concatenate(cols["ce"])[valid]  # (nv, T+2)
            ber_all = np.concatenate(cols["ber"])[valid]
            ce_list = [float(x) for x in ce_all.sum(axis=0)]
            ber_list = [float(x) / (nv * code.n) for x in ber_all.sum(axis=0)]
        elif n_osd:
            # publication budgets (>=2000 failures/point, r4 VERDICT item 3)
            # walk in FIXED 4096-frame chunks so one compile serves every
            # point; small sets keep the exact-size single call (cheap on
            # CPU tests, and the TPU compile cache already has those shapes)
            osd_b = 4096 if n_osd > 4096 else n_osd
            succ_parts, strict_parts, cplx_parts, win_parts = [], [], [], []
            refined_parts = []
            acc_j = jnp.asarray(acc, jnp.int32)
            for i0 in range(0, n_osd, osd_b):
                hi_i = min(i0 + osd_b, n_osd)
                t_c = fb.trajectories[i0:hi_i]
                l_c = fb.labels[i0:hi_i]
                live = len(t_c)
                if live < osd_b:  # pad the tail chunk to the compiled shape
                    reps = osd_b - live
                    t_c = np.concatenate([t_c, np.tile(t_c[:1], (reps, 1, 1))])
                    l_c = np.concatenate([l_c, np.tile(l_c[:1], (reps, 1))])
                out, refined = osd_step(
                    dia_params, jnp.asarray(t_c, jnp.float32),
                    jnp.asarray(l_c, jnp.int32), teps_j, mask_j, acc_j, fcn,
                )
                succ_parts.append(np.asarray(out["success"])[:live])
                strict_parts.append(np.asarray(out["strict_success"])[:live])
                cplx_parts.append(np.asarray(out["complexity"])[:live])
                win_parts.append(np.asarray(out["window_num"])[:live])
                refined_parts.append(np.asarray(refined)[:live])
            succ = np.concatenate(succ_parts)
            refined = np.concatenate(refined_parts)
            osd_stats = {
                "success": int(succ.sum()),
                "fail": int((~succ).sum()),
                "strict_success": int(np.concatenate(strict_parts).sum()),
                "complexity": float(np.concatenate(cplx_parts).mean()),
                "windows": float(np.concatenate(win_parts).mean()),
            }
            # per-iteration CE + BER over the failure set + the DIA-refined
            # slot (reference 'CE list'/'BER list' bookkeeping,
            # ms_test.py:251-267 / nn_testing.py:205-210)
            ce_list = iteration_ce_list(fb.trajectories[:n_osd], fb.labels[:n_osd])
            ber_list = iteration_ber_list(fb.trajectories[:n_osd], fb.labels[:n_osd])
            refined_np = np.asarray(refined)
            logits = -refined_np.astype(np.float64)
            z = fb.labels[:n_osd].astype(np.float64)
            ce_list.append(
                float(
                    (np.maximum(logits, 0) - logits * z
                     + np.log1p(np.exp(-np.abs(logits)))).sum()
                )
            )
            ber_list.append(
                float(((refined_np <= 0) != (fb.labels[:n_osd] > 0)).mean())
            )
        osd_time = time.time() - t1
        fer_nms = stats.detected_failures / max(stats.frames, 1)
        denom = osd_stats["success"] + osd_stats["fail"]
        fer_osd = osd_stats["fail"] / denom if denom else 0.0
        fer_total = fer_nms * fer_osd + stats.ufer  # undetected errors are final
        lo, hi = stats.fer_confidence()
        # Wilson CI on the OSD stage and a delta-method CI on the product
        # (r4 VERDICT weak #2: the curve carried fer_nms_ci only).  With
        # independent binomial stages, var(log f_total) ~= var(log f_nms) +
        # var(log f_osd); the product CI is f_total * exp(+-1.96 * se_log).
        from ..utils.metrics import wilson_interval

        osd_lo, osd_hi = wilson_interval(osd_stats["fail"], max(denom, 1))
        if fer_nms > 0 and fer_osd > 0 and denom:
            se_nms = np.sqrt(
                fer_nms * (1 - fer_nms) / max(stats.frames, 1)) / fer_nms
            se_osd = np.sqrt(
                fer_osd * (1 - fer_osd) / denom) / fer_osd
            se_log = float(np.sqrt(se_nms ** 2 + se_osd ** 2))
            tot_ci = [
                fer_nms * fer_osd * np.exp(-1.96 * se_log) + stats.ufer,
                fer_nms * fer_osd * np.exp(1.96 * se_log) + stats.ufer,
            ]
        else:
            tot_ci = [stats.ufer, hi * osd_hi + stats.ufer]
        point = {
            "snr_db": float(snr),
            "frames": stats.frames,
            "fer_nms_detected": fer_nms,
            "fer_nms_any": stats.fer,
            "fer_nms_ci": [lo, hi],
            "ufer": stats.ufer,
            "osd": osd_stats,
            "fer_osd": fer_osd,
            "fer_osd_ci": [osd_lo, osd_hi],
            "fer_total": fer_total,
            "fer_total_ci": [float(tot_ci[0]), float(tot_ci[1])],
            # rows the in-step re-decode did not confirm as detected
            # failures (fused path only; excluded from every OSD stat)
            "osd_unconfirmed": unconfirmed,
            "nms_time_s": nms_time,
            "osd_time_s": osd_time,
            "nms_frames_per_s": stats.frames / max(nms_time, 1e-9),
            "ce_list": ce_list,
            "ber_list": ber_list,
        }
        curve.append(point)
        jsonl.log(point)
        log(
            f"  snr {snr:.2f}: FER_nms {fer_nms:.3e} x FER_osd {fer_osd:.3e} "
            f"-> {fer_total:.3e} ({stats.frames} frames, {n_osd} OSD)"
        )
        run.save_json("fer_curve.json", {"points": curve})
    return {"points": curve}


def run_recipe(cfg: RecipeConfig, run_root: str, snrs=None, log=print) -> dict:
    run = RunDir(run_root)
    run.save_json("config.json", dataclasses.asdict(cfg))
    snrs = snrs if snrs is not None else np.linspace(2.0, 3.0, 6)
    log("[1/5] training NMS decoder")
    nms_params = stage_train_nms(cfg, run, log)
    log("[2/5] harvesting training failures")
    fb = stage_harvest_failures(cfg, run, nms_params, log)
    log("[3/5] training DIA + decoding path")
    model, dia_params, decoding_path = stage_train_dia_and_path(cfg, run, fb, log)
    log("[4/5] training stopper")
    s_params = stage_train_stopper(cfg, run, model, dia_params, fb, decoding_path, log)
    log("[5/5] FER sweep")
    curve = stage_eval_sweep(
        cfg, run, nms_params, model, dia_params, s_params, decoding_path, snrs, log
    )
    return curve
