import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.mc import run_nms_mc
from short_ldpc_decoding_osd_tpu.ops import nms
from short_ldpc_decoding_osd_tpu.osd import engine
from short_ldpc_decoding_osd_tpu.parallel import make_mesh
from short_ldpc_decoding_osd_tpu.utils import checkpoint as ckpt_lib
from short_ldpc_decoding_osd_tpu.utils.profiling import JsonlLogger, Timer, flops_estimate


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    d = str(tmp_path / "ck")
    for step in (1, 2, 3, 4, 5, 6, 7):
        ckpt_lib.save(d, step, tree, keep=3)
    assert ckpt_lib.list_steps(d) == [5, 6, 7]
    step, loaded, extra = ckpt_lib.load(d)
    assert step == 7
    np.testing.assert_array_equal(loaded["a"], np.arange(4.0))


def test_mc_resume(code, tmp_path):
    params = nms.init_params("NMS-1")
    rp = str(tmp_path / "resume.json")
    stats1, _ = run_nms_mc(
        code, params, "NMS-1", 4, 3.0, batch=256, error_budget=10**9,
        max_frames=1024, resume_path=rp,
    )
    saved = json.load(open(rp))
    assert saved["stats"]["frames"] == stats1.frames == 1024
    # resuming with a higher frame cap continues from the saved counters
    stats2, _ = run_nms_mc(
        code, params, "NMS-1", 4, 3.0, batch=256, error_budget=10**9,
        max_frames=2048, resume_path=rp,
    )
    assert stats2.frames == 2048


def test_mc_sharded_path(code):
    mesh = make_mesh(8)
    params = nms.init_params("NMS-1")
    with mesh:
        stats, fb = run_nms_mc(
            code, params, "NMS-1", 4, 3.0, batch=32, error_budget=10**9,
            max_frames=512, mesh=mesh,
        )
    assert fb is None
    assert stats.frames == 512


def test_pruned_batch_osd(code):
    rng = np.random.default_rng(2)
    words = code.encode(rng.integers(0, 2, (6, code.k)))
    noise = rng.normal(0, 0.9, (6, code.n))
    original = (np.where(words == 0, 1.0, -1.0) + noise).astype(np.float32)
    updated = original * 1.5
    prep = engine.prepare(
        jnp.asarray(updated), jnp.asarray(original), jnp.asarray(words),
        jnp.asarray(code.h), code.k,
    )
    from short_ldpc_decoding_osd_tpu.osd import segments

    path = [[0] * 6, [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0]]
    blocks, _ = segments.build_tep_blocks(path, code.k)
    teps_all = jnp.asarray(np.concatenate(blocks))
    out_np = engine.pruned_batch_osd(prep, teps_all, code.k, prune=False)
    out_p = engine.pruned_batch_osd(prep, teps_all, code.k, prune=True)
    # pruning only removes candidates
    assert (
        np.asarray(out_p["num_candidates"]) <= np.asarray(out_np["num_candidates"])
    ).all()
    # un-pruned argmin must achieve a discrepancy <= pruned argmin
    assert (
        np.asarray(out_np["min_discrepancy"])
        <= np.asarray(out_p["min_discrepancy"]) + 1e-4
    ).all()


def test_profiling_utils(code, tmp_path):
    timer = Timer()
    x = jnp.ones((128, 128))
    with timer.measure("matmul", result=x):
        y = x @ x
    assert timer.summary()["matmul"]["n"] == 1
    fl = flops_estimate(lambda a: a @ a, x)
    assert fl is None or fl > 0
    log = JsonlLogger(str(tmp_path / "m.jsonl"))
    log.log({"metric": 1})
    log.log({"metric": 2})
    lines = open(log.path).read().strip().splitlines()
    assert len(lines) == 2


def test_msg_harvest_flip_detected(monkeypatch):
    """SLDPC_MSG_HARVEST is baked into compiled kernels at import; flipping
    it mid-process must raise, not silently keep the other sampler."""
    import pytest

    from short_ldpc_decoding_osd_tpu.ops import mc_pallas

    assert mc_pallas.msg_harvest_enabled() == mc_pallas._MSG_HARVEST
    monkeypatch.setenv(
        "SLDPC_MSG_HARVEST", "0" if mc_pallas._MSG_HARVEST else "1"
    )
    with pytest.raises(RuntimeError, match="changed after import"):
        mc_pallas.msg_harvest_enabled()
