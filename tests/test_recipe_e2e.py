"""run_recipe executed END TO END (tiny budgets, CPU).

Until r5 the recipe orchestration (stage_train_* skip/reuse logic +
stage_eval_sweep with its CI/chunking/bookkeeping) had no non-monkeypatched
test — a NameError in stage_eval_sweep shipped through a green suite and
surfaced only on the TPU run.  Training lengths are shrunk by wrapping the
real train functions; every other code path is the production one.
"""

import dataclasses

import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.pipeline import recipe as rec


@pytest.fixture()
def tiny_recipe(monkeypatch):
    real_nms, real_dia, real_stop = rec.train_nms, rec.train_dia, rec.train_stopper

    def tiny_nms(code, cfg, **kw):
        cfg = dataclasses.replace(
            cfg, termination_step=10, batch=64, num_batches=2,
            print_interval=5,
        )
        return real_nms(code, cfg, **kw)

    def tiny_dia(code, traj, labels, cfg, **kw):
        cfg = dataclasses.replace(cfg, termination_step=40, batch=16)
        return real_dia(code, traj, labels, cfg, **kw)

    def tiny_stop(ins, labs, cfg, **kw):
        cfg = dataclasses.replace(cfg, termination_step=40, batch=64)
        return real_stop(ins, labs, cfg, **kw)

    monkeypatch.setattr(rec, "train_nms", tiny_nms)
    monkeypatch.setattr(rec, "train_dia", tiny_dia)
    monkeypatch.setattr(rec, "train_stopper", tiny_stop)
    return rec


def test_run_recipe_end_to_end_small(tmp_path, tiny_recipe):
    cfg = rec.RecipeConfig(
        num_iterations=6,
        nms_error_budget=40,
        osd_failure_budget=24,
        train_failure_target=48,
        max_frames_per_snr=2048,
        eval_batch=512,
        capture_batch=512,
        decoding_length=8,
    )
    run_dir = str(tmp_path / "run")
    curve = rec.run_recipe(cfg, run_dir, snrs=[2.0, 3.0], log=lambda *_: None)
    pts = curve["points"]
    assert len(pts) == 2
    for p in pts:
        assert p["osd"]["success"] + p["osd"]["fail"] > 0
        assert 0.0 <= p["fer_total"] <= 1.0
        lo, hi = p["fer_total_ci"]
        assert 0.0 <= lo <= hi
        assert len(p["fer_osd_ci"]) == 2
        # CE/BER lists cover T+1 iteration slots + the DIA-refined slot
        assert len(p["ce_list"]) == cfg.num_iterations + 2
        assert len(p["ber_list"]) == cfg.num_iterations + 2
    # artifacts for every stage landed in the run dir
    run = rec.RunDir(run_dir)
    for name in ("nms_params.pkl", "train_failures.npz", "decoding_path.json",
                 "stopper_params.pkl", "fer_curve.json", "config.json"):
        assert run.has(name), name
    # re-invocation REUSES the trained artifacts (stage skip logic)
    curve2 = rec.run_recipe(cfg, run_dir, snrs=[2.0], log=lambda *_: None)
    assert len(curve2["points"]) == 1


def test_capture_batch_bounds_large_code(monkeypatch):
    """_capture_batch on a fake TPU backend: the edge-XLA rung bound for the
    (1056,880) WiMAX code must stay inside the measured HBM envelope
    (32768 ran at ~10 GB; 65536 OOMed at 20.3 GB), and the NMS-r dense
    fallback must respect the ~1.5 GB dense-tensor bound."""
    import jax

    from short_ldpc_decoding_osd_tpu.codes import get_code

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    code = get_code("wimax_1056_880")
    cfg = rec.RecipeConfig(code_name=code.name)
    b = rec._capture_batch(cfg, code)
    assert 256 <= b < 65536 and b % 256 == 0

    # WiMAX is check-regular (dc=20 on every row), so NMS-r rides the
    # edge-XLA rung and gets the same memory-enveloped bound
    cfg_r = dataclasses.replace(cfg, variant="NMS-r")
    assert rec._capture_batch(cfg_r, code) == b

    # with no fast rung at all (force supports() off) the dense decoder's
    # ~1.5 GB message-tensor bound applies
    monkeypatch.setattr(
        "short_ldpc_decoding_osd_tpu.ops.nms_edge_xla.supports",
        lambda h, v: False,
    )
    b_d = rec._capture_batch(cfg_r, code)
    m, n = code.h.shape
    assert 256 <= b_d
    assert b_d * m * n * 4 * 3 <= 1.6e9 or b_d == 256
