"""End-to-end slice: train NMS briefly -> harvest failures -> train DIA ->
decoding path -> stopper samples/training -> sliding-OSD eval.  Small scale,
CPU; validates the full two-phase pipeline wiring."""

import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.mc import run_nms_mc
from short_ldpc_decoding_osd_tpu.models import stopper_engine_params
from short_ldpc_decoding_osd_tpu.ops import nms
from short_ldpc_decoding_osd_tpu.osd import engine, segments
from short_ldpc_decoding_osd_tpu.train import (
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


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


@pytest.fixture(scope="module")
def trained_nms(code):
    cfg = NMSTrainConfig(
        variant="NMS-1",
        num_iterations=6,
        batch=64,
        num_batches=4,
        termination_step=12,
        print_interval=6,
    )
    params, summary = train_nms(code, cfg)
    return params, summary


def test_nms_training_learns_factor(trained_nms):
    params, summary = trained_nms
    # factor must have moved from init and the loss be finite
    assert float(params["check"][0]) != pytest.approx(-0.048)
    assert np.isfinite(summary["final_loss"])


@pytest.fixture(scope="module")
def failures(code, trained_nms):
    params, _ = trained_nms
    stats, fb = run_nms_mc(
        code,
        params,
        "NMS-1",
        num_iterations=6,
        snr_db=2.0,
        batch=256,
        error_budget=100,
        max_frames=2048,
        capture_failures=True,
    )
    assert fb is not None and len(fb.trajectories) > 10
    assert stats.detected_failures >= len(fb.trajectories)
    return fb


def test_full_two_phase_pipeline(code, failures):
    fb = failures
    model, dia_params, _ = train_dia(
        code,
        fb.trajectories,
        fb.labels,
        DIATrainConfig(model="model_cnn", batch=32, termination_step=10),
    )
    sweep = pattern_statistics_sweep(
        code, model, dia_params, fb.trajectories, fb.labels, batch=64
    )
    counter = sweep["pattern_counter"]
    assert counter.total == len(fb.trajectories)
    path = counter.decoding_path(threshold_sum=3, decoding_length=8)
    assert len(path) >= 1
    # always include the zero pattern at the front if absent (failures may
    # never have zero MRB errors but the engine needs a base block)
    if [0] * 6 not in path:
        path = [[0] * 6] + path[:7]

    records, summary = generate_stopper_samples(
        code, model, dia_params, fb.trajectories, fb.labels, path, batch=64
    )
    assert summary["success"] + summary["fail"] == len(records)
    if len(records) < 4:
        pytest.skip("too few stopper samples at this scale")
    window = min(5, len(path) - 1)
    ins, labs = reform_windows(records, window=window)
    assert ins.shape[1] == window + 1
    model_s, s_params, val = train_stopper(
        ins, labs, StopperTrainConfig(window=window, termination_step=10, batch=64)
    )
    assert val["success"] + val["late"] + val["premature"] == val["total"]

    # final: sliding OSD eval over the failure set
    blocks, acc = segments.build_tep_blocks(path, code.k)
    teps, mask = segments.stack_padded_blocks(blocks)
    traj = jnp.asarray(fb.trajectories, jnp.float32)
    refined = model.refine(dia_params, traj)
    prep = engine.prepare(
        refined, traj[:, 0], jnp.asarray(fb.labels), jnp.asarray(code.h), code.k
    )
    out = engine.sliding_osd(
        prep,
        jnp.asarray(teps),
        jnp.asarray(mask),
        acc,
        stopper_engine_params(s_params),
        code.k,
        window=window,
    )
    n_frames = len(fb.trajectories)
    assert out["success"].shape == (n_frames,)
    # OSD should rescue a decent share of NMS failures
    rescue_rate = float(np.asarray(out["success"]).mean())
    assert rescue_rate > 0.2


def test_dia_resume_continues_at_saved_step(tmp_path, code, failures):
    """r4 ADVICE: DIA checkpoints store step == completed-step-count; resume
    must continue at exactly that step (the old +1 skipped one index)."""
    traj, labels = failures.trajectories, failures.labels
    ckpt = str(tmp_path / "dia_ckpt")
    cfg = DIATrainConfig(model="model_cnn", batch=8, termination_step=100)
    train_dia(code, traj, labels, cfg, ckpt_dir=ckpt)
    cfg2 = DIATrainConfig(model="model_cnn", batch=8, termination_step=150)
    recs = []
    train_dia(code, traj, labels, cfg2, ckpt_dir=ckpt, log_fn=recs.append)
    # resumed run trains exactly steps 100..150: first logged block ends at 150
    assert recs[0]["step"] == 150
    assert len(recs) == 1
