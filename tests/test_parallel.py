import jax
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.channel import ChannelSpec
from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import nms
from short_ldpc_decoding_osd_tpu.parallel import (
    make_mesh,
    sharded_nms_mc_step,
    sharded_nms_train_step,
)


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8


def test_sharded_mc_step_counts(code):
    mesh = make_mesh(8)
    spec = ChannelSpec.awgn(4.0, code.rate)
    params = nms.init_params("NMS-1")
    with mesh:
        step = sharded_nms_mc_step(code, "NMS-1", 6, spec, 8, mesh)
        counters = np.asarray(step(params, jax.random.PRNGKey(0)))
    assert counters[0] == 64
    assert 0 <= counters[1] <= 64
    # detected + undetected partition of errors is consistent
    assert counters[4] <= counters[1]


def test_sharded_train_step_updates_params(code):
    mesh = make_mesh(4)
    spec = ChannelSpec.awgn(2.7, code.rate)
    params = nms.init_params("NMS-1")
    with mesh:
        tx, step = sharded_nms_train_step(code, "NMS-1", 4, spec, 4, mesh)
        opt_state = tx.init(params)
        new_params, _, loss = step(params, opt_state, jax.random.PRNGKey(0))
    assert float(loss) > 0
    assert float(new_params["check"][0]) != float(params["check"][0])


def test_graft_entry_single_chip():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (13, 32, 128)


def test_graft_entry_multichip():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_device_seeds_bijective_and_single_device_compatible():
    from short_ldpc_decoding_osd_tpu.parallel import device_seeds

    # 1 device: exactly the single-device harness seed stream
    for idx in (0, 1, 17):
        s = device_seeds(5, idx, 1)
        assert s.shape == (1,)
        assert int(s[0]) == (5 * 100003 + idx) & 0x7FFFFFFF
    # no (step, device) collisions across a window of steps
    seen = set()
    for idx in range(16):
        for s in device_seeds(0, idx, 8):
            assert int(s) not in seen
            seen.add(int(s))


def test_sharded_seed_counters_psum(code):
    """The shard_map bridge gives every device its own seed and psums the
    per-device counters."""
    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.parallel import (
        device_seeds,
        sharded_seed_counters,
    )

    mesh = make_mesh(8)

    def fake_counters(params, seed):
        e = (seed % 7).astype(jnp.float32)
        return jnp.stack([jnp.float32(64.0), e, 2.0 * e, e, 0.0, 0.0])

    prog = sharded_seed_counters(mesh, fake_counters)
    seeds = device_seeds(3, 0, 8)
    with mesh:
        out = np.asarray(prog({"check": np.zeros(1)}, jnp.asarray(seeds)))
    expect_e = float(sum(int(s) % 7 for s in seeds))
    np.testing.assert_allclose(
        out, [64.0 * 8, expect_e, 2 * expect_e, expect_e, 0.0, 0.0]
    )


def test_sharded_fused_step_ladder_lands_on_xla_off_tpu(code):
    """On a CPU mesh the fused rungs cannot lower (no pltpu PRNG); the ladder
    must demote and finish the step with the sharded XLA decoder instead of
    crashing — the same chain the dryrun exercises."""
    import warnings as _w

    from short_ldpc_decoding_osd_tpu.parallel import sharded_fused_mc_step

    mesh = make_mesh(8)
    params = nms.init_params("NMS-1")
    with mesh, _w.catch_warnings():
        _w.simplefilter("ignore")
        step = sharded_fused_mc_step(
            code, "NMS-1", 6, 3.0, per_device_batch=32, mesh=mesh, base_seed=0
        )
        c, cap = step(params, jax.random.PRNGKey(0), 0)
    assert cap is None
    assert int(c[0]) == 32 * 8
    assert 0 <= int(c[1]) <= 32 * 8


def test_harness_mesh_uses_fused_kernels(monkeypatch, code):
    """With a mesh AND a TPU backend the harness must run the fused kernels
    per device (psum'd), not silently fall back to the slow XLA decoder
    (round-2 VERDICT item 2)."""
    import jax.numpy as jnp

    import short_ldpc_decoding_osd_tpu.mc.harness as harness
    import short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas as ep
    from short_ldpc_decoding_osd_tpu.mc import run_nms_mc
    from short_ldpc_decoding_osd_tpu.parallel import device_seeds

    monkeypatch.setattr(harness.jax, "default_backend", lambda: "tpu")

    def fake_compact(code_, p, variant, iters, snr_db, batch, seed, **kw):
        e = (seed % 7).astype(jnp.float32)
        return jnp.stack([jnp.float32(batch), e, 2.0 * e, e, 0.0, 0.0])

    monkeypatch.setattr(ep, "fused_counters_edge_compact", fake_compact)
    mesh = make_mesh(8)
    params = nms.init_params("NMS-1")
    batch = 128  # per-device; must keep cblock >= 128 so the compact rung runs
    with mesh:
        stats, _ = run_nms_mc(
            code, params, "NMS-1", 12, 3.0, batch=batch,
            max_frames=2 * 8 * batch, error_budget=10**9, seed=3, mesh=mesh,
        )
    assert stats.frames == 2 * 8 * batch
    expect = sum(
        int(s) % 7 for idx in (0, 1) for s in device_seeds(3, idx, 8)
    )
    assert stats.frame_errors == expect
    assert stats.detected_failures == expect


def _ladder_fakes(monkeypatch, log, fail_compact=True, fail_blocks=()):
    """Install fused-kernel fakes that log every attempt and fail with a
    VMEM-style error for the compact rung / listed one-shot block sizes."""
    import jax.numpy as jnp

    import short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas as ep

    def fake_compact(code_, p, variant, iters, snr_db, batch, seed, **kw):
        log.append("compact")
        if fail_compact:
            raise RuntimeError("scoped vmem OOM (simulated)")
        return jnp.stack([jnp.float32(batch), 1.0, 2.0, 1.0, 0.0, 0.0])

    def fake_oneshot(code_, p, variant, iters, snr_db, batch, seed, **kw):
        blk = kw.get("block_frames")
        log.append(("oneshot", blk))
        if blk in fail_blocks:
            raise RuntimeError("scoped vmem OOM (simulated)")
        return jnp.stack([jnp.float32(batch), 1.0, 2.0, 1.0, 0.0])

    monkeypatch.setattr(ep, "fused_counters_edge_compact", fake_compact)
    monkeypatch.setattr(ep, "fused_counters_edge", fake_oneshot)


def test_ladder_rung_parity_single_vs_mesh(monkeypatch, code):
    """The single-device harness and the mesh path must walk the SAME rung
    sequence under the same failures (one shared ladder — r3 shipped two
    copies with drift risk)."""
    import warnings as _w

    import short_ldpc_decoding_osd_tpu.mc.harness as harness
    from short_ldpc_decoding_osd_tpu.mc import run_nms_mc
    from short_ldpc_decoding_osd_tpu.mc.ladder import ladder_blocks
    from short_ldpc_decoding_osd_tpu.parallel import sharded_fused_mc_step

    batch = 256
    eblock, _, compact_on = ladder_blocks(code, batch, 12)
    assert compact_on and eblock >= 16  # the scenario below needs both
    # compact fails, full-block one-shot fails, half block succeeds
    monkeypatch.setattr(harness.jax, "default_backend", lambda: "tpu")

    log_single = []
    _ladder_fakes(monkeypatch, log_single, fail_blocks=(eblock,))
    params = nms.init_params("NMS-1")
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        stats, _ = run_nms_mc(
            code, params, "NMS-1", 12, 3.0, batch=batch, max_frames=batch,
            error_budget=10**9, seed=1,
        )
    assert stats.frames == batch

    log_mesh = []
    _ladder_fakes(monkeypatch, log_mesh, fail_blocks=(eblock,))
    mesh = make_mesh(1)
    with mesh, _w.catch_warnings():
        _w.simplefilter("ignore")
        step = sharded_fused_mc_step(
            code, "NMS-1", 12, 3.0, per_device_batch=batch, mesh=mesh,
            base_seed=1,
        )
        c, _ = step(params, jax.random.PRNGKey(0), 0)
    assert int(c[0]) == batch
    # identical attempt sequence, rung for rung
    assert log_single == log_mesh == [
        "compact", ("oneshot", eblock), ("oneshot", eblock // 2)
    ]


def test_mesh_rung_pinning(monkeypatch, code):
    """SLDPC_MESH_RUNG pre-pins the ladder uniformly (the multi-host lever:
    demotion is host-local and would diverge collective programs)."""
    import warnings as _w

    from short_ldpc_decoding_osd_tpu.parallel import sharded_fused_mc_step

    params = nms.init_params("NMS-1")
    mesh = make_mesh(2)

    log = []
    _ladder_fakes(monkeypatch, log, fail_compact=False)
    monkeypatch.setenv("SLDPC_MESH_RUNG", "oneshot")
    with mesh:
        step = sharded_fused_mc_step(
            code, "NMS-1", 12, 3.0, per_device_batch=256, mesh=mesh,
            base_seed=0,
        )
        c, _ = step(params, jax.random.PRNGKey(0), 0)
    assert int(c[0]) == 2 * 256
    assert "compact" not in log  # the compact rung was never attempted

    log2 = []
    _ladder_fakes(monkeypatch, log2, fail_compact=False)
    monkeypatch.setenv("SLDPC_MESH_RUNG", "xla")
    with mesh, _w.catch_warnings():
        _w.simplefilter("ignore")
        step = sharded_fused_mc_step(
            code, "NMS-1", 6, 3.0, per_device_batch=32, mesh=mesh,
            base_seed=0,
        )
        c, _ = step(params, jax.random.PRNGKey(0), 0)
    assert log2 == []  # no fused rung at all; the sharded XLA step ran
    assert int(c[0]) == 2 * 32

    monkeypatch.setenv("SLDPC_MESH_RUNG", "bogus")
    with pytest.raises(ValueError, match="compact|oneshot|xla"):
        sharded_fused_mc_step(
            code, "NMS-1", 6, 3.0, per_device_batch=32, mesh=mesh,
            base_seed=0,
        )


def test_multiproc_mesh_raises_instead_of_demoting(monkeypatch, code):
    """With >1 process a kernel error must RAISE (host-local demotion would
    issue different collective programs on different hosts = deadlock)."""
    import short_ldpc_decoding_osd_tpu.parallel.data_parallel as dp
    from short_ldpc_decoding_osd_tpu.parallel import sharded_fused_mc_step

    monkeypatch.setattr(dp.jax, "process_count", lambda: 2)
    log = []
    _ladder_fakes(monkeypatch, log, fail_compact=True)
    params = nms.init_params("NMS-1")
    mesh = make_mesh(2)
    with mesh:
        step = sharded_fused_mc_step(
            code, "NMS-1", 12, 3.0, per_device_batch=256, mesh=mesh,
            base_seed=0,
        )
        with pytest.raises(Exception, match="scoped vmem"):
            step(params, jax.random.PRNGKey(0), 0)
    assert log == ["compact"]  # no demotion walk happened


def test_multiproc_mesh_retries_transient_once(monkeypatch, code):
    """A transient TPU error re-issues the identical compiled program once
    even under >1 process (uniform across hosts), instead of aborting the
    pod sweep (r3 ADVICE)."""
    import warnings as _w

    import jax.numpy as jnp

    import short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas as ep
    import short_ldpc_decoding_osd_tpu.parallel.data_parallel as dp
    from short_ldpc_decoding_osd_tpu.parallel import sharded_fused_mc_step

    monkeypatch.setattr(dp.jax, "process_count", lambda: 2)
    calls = {"n": 0}

    def flaky_compact(code_, p, variant, iters, snr_db, batch, seed, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("UNAVAILABLE: TPU backend error (simulated)")
        return jnp.stack([jnp.float32(batch), 1.0, 2.0, 1.0, 0.0, 0.0])

    monkeypatch.setattr(ep, "fused_counters_edge_compact", flaky_compact)
    params = nms.init_params("NMS-1")
    mesh = make_mesh(2)
    with mesh, _w.catch_warnings():
        _w.simplefilter("ignore")
        step = sharded_fused_mc_step(
            code, "NMS-1", 12, 3.0, per_device_batch=256, mesh=mesh,
            base_seed=0,
        )
        c, _ = step(params, jax.random.PRNGKey(0), 0)
    assert calls["n"] == 2  # failed once, retried the same rung, succeeded
    assert int(c[0]) == 2 * 256


def test_sharded_dl_osd_step_matches_single_device(code):
    """The mesh OSD step's psum'd counters equal the single-device
    sliding_osd reduction on the same batch."""
    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.models import make_dia
    from short_ldpc_decoding_osd_tpu.osd import engine, segments
    from short_ldpc_decoding_osd_tpu.parallel import sharded_dl_osd_step

    rng = np.random.default_rng(5)
    b, t = 16, 6
    model = make_dia("model_cnn", code.n, t + 1)
    dia_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((code.n, t + 1, 1))
    )
    msgs = rng.integers(0, 2, (b, code.k))
    words = (msgs @ code.g % 2).astype(np.int8)
    noise = rng.normal(1.0, 0.9, (b, t + 1, code.n))
    traj = jnp.asarray(
        np.where(words[:, None, :] == 0, noise, -noise), jnp.float32
    )
    labs = jnp.asarray(words)

    path = [[0, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
            [1, 1, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0]]
    blocks, acc = segments.build_tep_blocks(path, code.k)
    teps, mask, bounds = segments.pack_tep_chunks(blocks, chunk=64)
    teps_j, mask_j = jnp.asarray(teps), jnp.asarray(mask)
    acc_j = jnp.asarray(acc, jnp.int32)
    fcn = {
        "w1": jnp.asarray(rng.normal(0, 0.3, (6, 6)), jnp.float32),
        "w2": jnp.asarray(rng.normal(0, 0.3, (6, 2)), jnp.float32),
    }

    refined = model.refine_fast(dia_params, traj)
    prep = engine.prepare(refined, traj[:, 0], labs, jnp.asarray(code.h),
                          code.k)
    ref = engine.sliding_osd(prep, teps_j, mask_j, acc_j, fcn, code.k,
                             bounds=bounds)
    want = np.array([
        int(np.asarray(ref["success"]).sum()),
        b - int(np.asarray(ref["success"]).sum()),
        int(np.asarray(ref["complexity"]).sum()),
        int(np.asarray(ref["windows_evaluated"]).sum()),
    ])

    mesh = make_mesh(8)
    with mesh:
        step = sharded_dl_osd_step(model, code.h, code.k, mesh, bounds=bounds)
        got = np.asarray(
            step(dia_params, traj, labs, teps_j, mask_j, acc_j, fcn)
        )
    np.testing.assert_array_equal(got, want)


def test_sharded_from_llr_step_matches_single_device(code):
    """The mesh RAW-LLR phase-2 step (r5 system path) psum's counters equal
    to the single-device fused from-llr step on the same frames — the
    re-decode, detected-flag accounting and walk all shard on the frame
    axis."""
    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.models import make_dia
    from short_ldpc_decoding_osd_tpu.ops import nms as nms_ops
    from short_ldpc_decoding_osd_tpu.osd import engine, segments
    from short_ldpc_decoding_osd_tpu.parallel import (
        make_mesh,
        sharded_dl_osd_step_from_llr,
    )

    rng = np.random.default_rng(9)
    b, t = 16, 6
    model = make_dia("model_cnn", code.n, t + 1)
    dia_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((code.n, t + 1, 1))
    )
    nms_params = nms_ops.init_params("NMS-1")
    msgs = rng.integers(0, 2, (b, code.k))
    words = (msgs @ code.g % 2).astype(np.int32)
    noise = rng.normal(0.6, 1.0, (b, code.n))  # noisy enough to fail often
    llr = jnp.asarray(np.where(words == 0, noise, -noise), jnp.float32)
    labs = jnp.asarray(words)

    path = [[0, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
            [1, 1, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0]]
    blocks, acc = segments.build_tep_blocks(path, code.k)
    teps, mask, bounds = segments.pack_tep_chunks(blocks, chunk=64)
    teps_j, mask_j = jnp.asarray(teps), jnp.asarray(mask)
    acc_j = jnp.asarray(acc, jnp.int32)
    fcn = {
        "w1": jnp.asarray(rng.normal(0, 0.3, (6, 6)), jnp.float32),
        "w2": jnp.asarray(rng.normal(0, 0.3, (6, 2)), jnp.float32),
    }

    single = engine.make_dl_osd_step_from_llr(
        model, code, "NMS-1", t, bounds=bounds, decoder="xla")
    out, _, det = single(nms_params, dia_params, llr, labs,
                         teps_j, mask_j, acc_j, fcn)
    det = np.asarray(det)
    want = np.array([
        b,
        int(det.sum()),
        int((np.asarray(out["success"]) & det).sum()),
        int(np.asarray(out["complexity"])[det].sum()),
        int(np.asarray(out["window_num"])[det].sum()),
    ])

    mesh = make_mesh(8)
    step = sharded_dl_osd_step_from_llr(
        model, code, "NMS-1", t, mesh, bounds=bounds)
    with mesh:
        got = np.asarray(step(nms_params, dia_params, llr, labs,
                              teps_j, mask_j, acc_j, fcn))
    np.testing.assert_array_equal(got, want)


def test_sharded_enms_uses_extended_h(code):
    """ENMS on the sharded XLA step must decode with the EXTENDED H, like
    the single-device harness (it silently used the plain H until r5).
    Same key => identical counters."""
    from short_ldpc_decoding_osd_tpu.mc.harness import build_nms_mc_step

    mesh = make_mesh(4)
    spec = ChannelSpec.awgn(2.5, code.rate)
    params = nms.init_params("ENMS")
    key = jax.random.PRNGKey(7)
    with mesh:
        step = sharded_nms_mc_step(code, "ENMS", 6, spec, 16, mesh)
        c_mesh = np.asarray(step(params, key))
    direct = build_nms_mc_step(
        code, "ENMS", 6, spec, 64, use_pallas=False, use_edge_xla=False
    )
    c_direct = np.asarray(direct(params, key)[0])
    assert np.array_equal(c_mesh, c_direct), (c_mesh, c_direct)


def test_sharded_edge_xla_rung_counters(code, monkeypatch):
    """Force the backend gate open on the CPU mesh: the edge-layout XLA
    rung's mesh program must reproduce the direct edge-XLA step's counters
    (same key, same HIGH-precision semantics)."""
    from short_ldpc_decoding_osd_tpu.mc.harness import build_nms_mc_step
    from short_ldpc_decoding_osd_tpu.parallel import data_parallel as dp

    mesh = make_mesh(4)
    spec = ChannelSpec.awgn(3.0, code.rate)
    params = nms.init_params("NMS-1")
    key = jax.random.PRNGKey(11)
    monkeypatch.setattr(dp.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        "short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas.auto_block_frames",
        lambda *a, **k: 0,
    )
    with mesh:
        step = sharded_nms_mc_step(code, "NMS-1", 6, spec, 16, mesh)
        c_mesh = np.asarray(step(params, key))
    direct = build_nms_mc_step(
        code, "NMS-1", 6, spec, 64, use_pallas=False, use_edge_xla=True
    )
    c_direct = np.asarray(direct(params, key)[0])
    assert np.array_equal(c_mesh, c_direct), (c_mesh, c_direct)


def test_sharded_train_enms_matches_single_device(code):
    """ENMS mesh training must use the EXTENDED H like train_nms (it used
    the plain H until r5): one same-key step from identical init must give
    the same loss and updated params as the single-device loss/update."""
    from short_ldpc_decoding_osd_tpu.ops import nms as nms_ops
    from short_ldpc_decoding_osd_tpu.train.optim import staircase_adam

    mesh = make_mesh(4)
    spec = ChannelSpec.awgn(2.7, code.rate)
    params = nms_ops.init_params("ENMS")
    key = jax.random.PRNGKey(13)
    from short_ldpc_decoding_osd_tpu.parallel.data_parallel import (
        sharded_nms_train_step,
    )

    with mesh:
        tx, step = sharded_nms_train_step(
            code, "ENMS", 6, spec, 16, mesh, 0.01, 500, 0.95, 5.0
        )
        p_mesh, _, loss_mesh = step(params, tx.init(params), key)

    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.channel import sample_batch

    train_code = code.extended()
    h = jnp.asarray(train_code.h, jnp.float32)
    gen = jnp.asarray(code.g, jnp.float32)
    llr, words = sample_batch(key, spec, gen, 64)
    tx2 = staircase_adam(0.01, 500, 0.95, 5.0)

    def loss_fn(p):
        outs = nms_ops.decode(p, h, llr, 6, "ENMS")
        return nms_ops.multi_iteration_loss(outs, words)

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = tx2.update(grads, tx2.init(params), params)
    p_ref = jax.tree.map(lambda p, u: p + u, params, updates)
    assert np.allclose(float(loss_mesh), float(loss_ref), rtol=1e-6)
    for k in p_ref:
        np.testing.assert_allclose(
            np.asarray(p_mesh[k]), np.asarray(p_ref[k]), rtol=1e-5, atol=1e-7
        )
