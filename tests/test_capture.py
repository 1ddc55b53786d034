import jax
import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.mc import run_nms_mc
from short_ldpc_decoding_osd_tpu.mc.harness import trajectories_for_llrs
from short_ldpc_decoding_osd_tpu.ops import nms


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


def test_recaptured_trajectories_match_direct_decode(code):
    params = nms.init_params("NMS-1")
    rng = np.random.default_rng(0)
    llrs = rng.normal(1.0, 0.9, (10, code.n)).astype(np.float32)
    traj = trajectories_for_llrs(code, params, "NMS-1", 6, llrs, chunk=4)
    direct = nms.decode(
        params, jnp.asarray(code.h), jnp.asarray(llrs), 6, "NMS-1"
    )
    np.testing.assert_allclose(
        traj, np.transpose(np.asarray(direct), (1, 0, 2)), rtol=1e-6, atol=1e-6
    )


def test_capture_consistency_with_stats(code):
    params = nms.init_params("NMS-1")
    stats, fb = run_nms_mc(
        code, params, "NMS-1", 4, 2.5, batch=512, error_budget=10**9,
        max_frames=1024, capture_failures=True,
    )
    assert fb is not None
    assert len(fb.trajectories) + fb.overflow == stats.detected_failures
    assert fb.trajectories.shape[1:] == (5, code.n)
    # captured rows really are failures: nonzero syndrome on last iteration
    h = jnp.asarray(code.h)
    st = nms.frame_stats(
        jnp.asarray(fb.trajectories[:, -1]), jnp.asarray(fb.labels), h
    )
    assert bool(jnp.all(st["detected_failure"]))


def test_detected_failure_mask_matches_frame_stats(code):
    from short_ldpc_decoding_osd_tpu.mc.harness import detected_failure_mask

    rng = np.random.default_rng(1)
    traj = rng.normal(0.3, 1.0, (64, 5, code.n)).astype(np.float32)
    mask = detected_failure_mask(code, "NMS-1", traj)
    st = nms.frame_stats(
        jnp.asarray(traj[:, -1]), jnp.zeros((64, code.n), jnp.int32),
        jnp.asarray(code.h),
    )
    np.testing.assert_array_equal(mask, np.asarray(st["detected_failure"]))


def test_capture_drops_unconfirmed_failures(monkeypatch, code):
    """Frames the capture kernel flagged but the bit-exact re-decode does not
    confirm must be dropped and counted (the capture kernel may be the edge
    kernel, which agrees with the XLA decoder only to f32 rounding)."""
    import short_ldpc_decoding_osd_tpu.mc.harness as harness

    real = harness.trajectories_for_llrs

    def fake(code_, params, variant, iters, llrs, chunk=4096):
        traj = real(code_, params, variant, iters, llrs, chunk=chunk)
        if len(traj):
            traj = traj.copy()
            # frame 0 "re-decodes" to the all-zeros codeword: zero syndrome
            traj[0, -1] = np.abs(traj[0, -1]) + 1.0
        return traj

    monkeypatch.setattr(harness, "trajectories_for_llrs", fake)
    params = nms.init_params("NMS-1")
    stats, fb = run_nms_mc(
        code, params, "NMS-1", 4, 2.5, batch=512, error_budget=10**9,
        max_frames=512, capture_failures=True,
    )
    assert fb.mismatches == 1
    assert len(fb.trajectories) + fb.overflow + fb.mismatches == (
        stats.detected_failures
    )
    # everything kept is a confirmed detected failure
    assert harness.detected_failure_mask(code, "NMS-1", fb.trajectories).all()


def test_capture_step_one_compile_serves_all_snrs(code):
    """The capture step's (mean, sigma) are runtime scalars: two SNR points
    share one cached jitted step (per-point retrace was the capture path's
    dominant cost in r3)."""
    from short_ldpc_decoding_osd_tpu.channel import ChannelSpec
    from short_ldpc_decoding_osd_tpu.mc.harness import (
        _STEP_CACHE,
        build_nms_mc_step,
    )

    before = len(_STEP_CACHE)
    s1 = build_nms_mc_step(
        code, "NMS-1", 4, ChannelSpec.awgn(2.0, code.rate), 128,
        capture_capacity=64,
    )
    s2 = build_nms_mc_step(
        code, "NMS-1", 4, ChannelSpec.awgn(3.5, code.rate), 128,
        capture_capacity=64,
    )
    assert len(_STEP_CACHE) == before + 1  # one inner jit for both points
    params = nms.init_params("NMS-1")
    key = jax.random.PRNGKey(0)
    c1, cap1 = s1(params, key)
    c2, cap2 = s2(params, key)
    # same key, different sigma -> different outcomes through one program
    assert int(c1[0]) == int(c2[0]) == 128
    assert int(c1[3]) != int(c2[3]) or int(c1[1]) != int(c2[1])


def test_fused_fallback_chain(monkeypatch, recwarn, code):
    """A fused-kernel compile failure must demote compact -> one-shot ->
    halved blocks -> the plain XLA step instead of crashing the sweep
    (the VMEM fit model is calibrated, not exact; see mc/harness.py)."""
    import warnings as _w

    import short_ldpc_decoding_osd_tpu.mc.harness as harness
    import short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas as ep

    monkeypatch.setattr(harness.jax, "default_backend", lambda: "tpu")
    calls = {"compact": 0, "oneshot": 0}

    def boom_compact(*a, **k):
        calls["compact"] += 1
        raise RuntimeError("scoped vmem OOM (simulated)")

    def boom_oneshot(*a, **k):
        calls["oneshot"] += 1
        raise RuntimeError("scoped vmem OOM (simulated)")

    monkeypatch.setattr(ep, "fused_counters_edge_compact", boom_compact)
    monkeypatch.setattr(ep, "fused_counters_edge", boom_oneshot)
    params = nms.init_params("NMS-1")
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        stats, _ = run_nms_mc(
            code, params, "NMS-1", 12, 3.0, batch=256, max_frames=256,
            error_budget=10**9, seed=1,
        )
    assert stats.frames == 256  # the XLA step finished the sweep
    assert 0 < stats.fer < 1
    assert calls["compact"] == 1  # tried once, permanently demoted
    assert calls["oneshot"] >= 1  # walked the halving ladder


def _fake_fused(seed_log):
    """Deterministic stand-in for the fused MC kernels: counters derived
    from the seed so step results are position-dependent like the real
    in-kernel PRNG streams."""

    def fake(code, p, variant, num_iterations, snr_db, batch, seed, **kw):
        seed_log.append(seed)
        errs = (seed * 2654435761) % 5
        return np.array(
            [batch, errs, errs * 3, errs, 0, 0.0], dtype=np.float64
        )

    return fake


def test_fused_resume_continues_seed_stream(monkeypatch, tmp_path, code):
    """Resume must continue the fused kernel's positional seed stream from
    the restored step_idx — not replay seeds 0..N (which double-counts
    frames already in the restored stats)."""
    import short_ldpc_decoding_osd_tpu.mc.harness as harness
    import short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas as ep

    monkeypatch.setattr(harness.jax, "default_backend", lambda: "tpu")
    params = nms.init_params("NMS-1")
    batch = 256

    # uninterrupted 4-step run
    log_a = []
    monkeypatch.setattr(ep, "fused_counters_edge_compact", _fake_fused(log_a))
    stats_a, _ = run_nms_mc(
        code, params, "NMS-1", 12, 3.0, batch=batch, max_frames=4 * batch,
        error_budget=10**9, seed=7,
    )

    # interrupted after 2 steps, then resumed to 4
    log_b = []
    monkeypatch.setattr(ep, "fused_counters_edge_compact", _fake_fused(log_b))
    resume = str(tmp_path / "resume.json")
    stats_b1, _ = run_nms_mc(
        code, params, "NMS-1", 12, 3.0, batch=batch, max_frames=2 * batch,
        error_budget=10**9, seed=7, resume_path=resume,
    )
    stats_b2, _ = run_nms_mc(
        code, params, "NMS-1", 12, 3.0, batch=batch, max_frames=4 * batch,
        error_budget=10**9, seed=7, resume_path=resume,
    )
    assert log_b == log_a  # seed stream continued, nothing re-consumed
    assert stats_b2.frames == stats_a.frames
    assert stats_b2.frame_errors == stats_a.frame_errors
    assert stats_b2.bit_errors == stats_a.bit_errors


def test_fused_transient_error_retries_once(monkeypatch, recwarn, code):
    """A transient TPU runtime error retries the SAME kernel config once
    instead of permanently demoting a multi-hour sweep to the XLA step."""
    import warnings as _w

    import short_ldpc_decoding_osd_tpu.mc.harness as harness
    import short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas as ep

    monkeypatch.setattr(harness.jax, "default_backend", lambda: "tpu")
    calls = {"n": 0}

    def flaky(code_, p, variant, num_iterations, snr_db, batch, seed, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("FAILED_PRECONDITION: TPU backend error")
        return np.array([batch, 1, 3, 1, 0, 0.0], dtype=np.float64)

    monkeypatch.setattr(ep, "fused_counters_edge_compact", flaky)
    params = nms.init_params("NMS-1")
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        stats, _ = run_nms_mc(
            code, params, "NMS-1", 12, 3.0, batch=256, max_frames=512,
            error_budget=10**9, seed=3,
        )
    assert stats.frames == 512
    assert calls["n"] == 3  # step 0: fail + retry-ok; step 1: ok


def test_fused_programming_error_propagates(monkeypatch, code):
    """ValueError from kernel/schedule validation must surface, not hide
    behind a misleading VMEM-failure demotion."""
    import short_ldpc_decoding_osd_tpu.mc.harness as harness
    import short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas as ep

    monkeypatch.setattr(harness.jax, "default_backend", lambda: "tpu")

    def bad(*a, **k):
        raise ValueError("schedule rows must decrease in multiples of 8")

    monkeypatch.setattr(ep, "fused_counters_edge_compact", bad)
    params = nms.init_params("NMS-1")
    with pytest.raises(ValueError, match="multiples of 8"):
        run_nms_mc(
            code, params, "NMS-1", 12, 3.0, batch=256, max_frames=256,
            error_budget=10**9, seed=5,
        )


def test_redecode_cache_distinguishes_same_name_codes():
    """r4 ADVICE (medium): cached jitted steps keyed on (name, n, m) only
    would silently reuse a step with the wrong H baked in for a same-named,
    same-shape Code with different structure.  Keys now carry an H digest."""
    from short_ldpc_decoding_osd_tpu.codes.code import Code

    h1 = np.array(
        [[1, 1, 0, 1, 0, 0], [0, 1, 1, 0, 1, 0], [1, 0, 1, 0, 0, 1]],
        np.uint8,
    )
    # same shape, different column layout (checks touch different bits)
    h2 = np.array(
        [[1, 0, 1, 1, 0, 0], [1, 1, 0, 0, 1, 0], [0, 1, 1, 0, 0, 1]],
        np.uint8,
    )
    c1 = Code.from_parity(h1, name="dup_code")
    c2 = Code.from_parity(h2, name="dup_code")
    params = nms.init_params("NMS-1")
    rng = np.random.default_rng(7)
    llrs = rng.normal(0.5, 1.0, (4, 6)).astype(np.float32)
    t1 = trajectories_for_llrs(c1, params, "NMS-1", 3, llrs, chunk=4)
    t2 = trajectories_for_llrs(c2, params, "NMS-1", 3, llrs, chunk=4)
    direct2 = nms.decode(
        params, jnp.asarray(c2.h, jnp.float32), jnp.asarray(llrs), 3, "NMS-1"
    )
    np.testing.assert_allclose(
        t2, np.transpose(np.asarray(direct2), (1, 0, 2)), rtol=1e-6, atol=1e-6
    )
    assert not np.allclose(t1, t2)
