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
