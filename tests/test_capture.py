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
