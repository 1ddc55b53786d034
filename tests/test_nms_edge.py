"""Edge-compact Pallas NMS kernel vs the XLA golden (interpret mode).

The edge kernel's matmul reduction trees round differently than the dense
row sums, so soft outputs match to f32 tolerance (not bitwise); the dense
kernels (test_nms_pallas) keep the bit-exact guarantee."""

import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.codes import Code, get_code
from short_ldpc_decoding_osd_tpu.ops import nms
from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import (
    auto_block_frames,
    decode_final_edge,
    edge_layout,
)


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


def _llr(code, batch, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(1.0, 0.8, (batch, code.n)), jnp.float32)


def test_edge_layout_roundtrip(code):
    scatter, gather, bias, slab_has_dummy = edge_layout(code.h)
    dc = int(code.h.sum(axis=1).max())
    assert scatter.shape == (dc, code.m, code.n)
    # scatter/gather are transposes of each other per edge slot
    for j in range(dc):
        np.testing.assert_array_equal(scatter[j].T, gather[j])
    # summing the one-hots over slots reconstructs H; no dummy edges (regular)
    np.testing.assert_array_equal(scatter.sum(axis=0), code.h.astype(np.float32))
    assert not bias.any()


def test_edge_decode_matches_xla(code):
    llr = _llr(code, 64)
    params = nms.init_params("NMS-1")
    ref = np.asarray(
        nms.decode_final(params, jnp.asarray(code.h, jnp.float32), llr, 12, "NMS-1")
    )
    got = np.asarray(
        decode_final_edge(params, code.h, llr, 12, "NMS-1",
                          block_frames=32, interpret=True, mode="highest")
    )
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
    assert ((got < 0) == (ref < 0)).mean() >= 0.999


def test_edge_decode_split_mode(code):
    """bf16 hi/lo split matmuls: ~2^-17 per-op error; hard decisions agree."""
    llr = _llr(code, 64)
    params = nms.init_params("NMS-1")
    ref = np.asarray(
        nms.decode_final(params, jnp.asarray(code.h, jnp.float32), llr, 12, "NMS-1")
    )
    got = np.asarray(
        decode_final_edge(params, code.h, llr, 12, "NMS-1",
                          block_frames=32, interpret=True, mode="split")
    )
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=5e-3)
    assert ((got < 0) == (ref < 0)).mean() >= 0.999


def test_edge_decode_irregular_rows():
    """Dummy-edge padding: rows of differing weight must decode like XLA."""
    rng = np.random.default_rng(3)
    while True:
        h = (rng.uniform(size=(16, 32)) < 0.22).astype(np.uint8)
        rows = h.sum(axis=1)
        if rows.min() >= 2 and len(set(rows.tolist())) > 1:
            try:
                code = Code.from_parity(h, "irregular_test")
                break
            except ValueError:
                continue
    scatter, gather, bias, slab_has_dummy = edge_layout(code.h)
    assert bias.any()  # irregular -> dummy edges exist
    llr = _llr(code, 32, seed=5)
    params = nms.init_params("NMS-1")
    ref = np.asarray(
        nms.decode_final(params, jnp.asarray(code.h, jnp.float32), llr, 8, "NMS-1")
    )
    got = np.asarray(
        decode_final_edge(params, code.h, llr, 8, "NMS-1",
                          block_frames=16, interpret=True, mode="highest")
    )
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_edge_decode_enms_extended(code):
    """ENMS decodes with the extended H (mixed row weights -> dummy edges)."""
    ext = code.extended()
    llr = _llr(code, 32, seed=7)
    params = nms.init_params("ENMS")
    ref = np.asarray(
        nms.decode_final(params, jnp.asarray(ext.h, jnp.float32), llr, 6, "ENMS")
    )
    got = np.asarray(
        decode_final_edge(params, ext.h, llr, 6, "ENMS",
                          block_frames=16, interpret=True, mode="highest")
    )
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_edge_decode_chunked_block(code):
    """block_frames=128 takes the chunks=2 path in _decode_edge (two
    interleaved row-chunk chains) — the branch the bench defaults (256/512)
    run on hardware.  Must match the XLA golden like the single-chunk path."""
    llr = _llr(code, 128, seed=11)
    params = nms.init_params("NMS-1")
    ref = np.asarray(
        nms.decode_final(params, jnp.asarray(code.h, jnp.float32), llr, 12, "NMS-1")
    )
    got = np.asarray(
        decode_final_edge(params, code.h, llr, 12, "NMS-1",
                          block_frames=128, interpret=True, mode="highest")
    )
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
    assert ((got < 0) == (ref < 0)).mean() >= 0.999
    # the two chunks must agree with the single-chunk result exactly (same
    # matmul shapes per chunk row set -> identical reduction trees)
    got64 = np.asarray(
        decode_final_edge(params, code.h, llr, 12, "NMS-1",
                          block_frames=64, interpret=True, mode="highest")
    )
    np.testing.assert_array_equal(got, got64)


def test_edge_decode_chunked_irregular():
    """chunks=2 path combined with dummy-edge bias (irregular rows)."""
    rng = np.random.default_rng(9)
    while True:
        h = (rng.uniform(size=(16, 32)) < 0.22).astype(np.uint8)
        rows = h.sum(axis=1)
        if rows.min() >= 2 and len(set(rows.tolist())) > 1:
            try:
                code = Code.from_parity(h, "irregular_chunked")
                break
            except ValueError:
                continue
    llr = _llr(code, 128, seed=13)
    params = nms.init_params("NMS-1")
    ref = np.asarray(
        nms.decode_final(params, jnp.asarray(code.h, jnp.float32), llr, 8, "NMS-1")
    )
    got = np.asarray(
        decode_final_edge(params, code.h, llr, 8, "NMS-1",
                          block_frames=128, interpret=True, mode="highest")
    )
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


# NOTE: mc_fused_edge (like mc_pallas.mc_fused) uses pltpu.prng_seed /
# prng_random_bits, which have no CPU-interpret lowering — its counters are
# validated against the dense kernel on real hardware by scripts/tpu_smoke.py.


def test_auto_block_frames_caps():
    assert auto_block_frames(64, 128, 8) == 512
    # huge code: constants alone blow VMEM -> 0 (fall back to XLA/dense)
    assert auto_block_frames(1024, 2048, 32) == 0
    # (512,256) dc=10: the double-buffered incidence constants (2 x 10.5 MiB)
    # exceed scoped VMEM at every block size (observed on v5e) -> 0
    assert auto_block_frames(256, 512, 10) == 0
    # (256,128) dc=10: one-shot fit observed to fail at block 256 on v5e
    # (17.01 MiB vs 16 MiB) and compile at 128; the compact variant needs
    # its sub-block scratch + rank maps on top
    assert auto_block_frames(128, 256, 10) == 128
    assert auto_block_frames(128, 256, 10, compact_frac=0.40625) <= 128


def test_edge_decode_bf16_mode(code):
    """Single-pass bf16 matmuls: coarse soft values but hard decisions must
    still overwhelmingly agree (FER equivalence is validated statistically on
    hardware, scripts/fer_mode_check.py)."""
    llr = _llr(code, 64)
    params = nms.init_params("NMS-1")
    ref = np.asarray(
        nms.decode_final(params, jnp.asarray(code.h, jnp.float32), llr, 12, "NMS-1")
    )
    got = np.asarray(
        decode_final_edge(params, code.h, llr, 12, "NMS-1",
                          block_frames=32, interpret=True, mode="bf16")
    )
    np.testing.assert_allclose(got, ref, atol=0.3, rtol=0.3)
    assert ((got < 0) == (ref < 0)).mean() >= 0.995


def test_build_rows_schedule():
    """Stage truncation + capacity floor for the compaction schedule."""
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import (
        DEFAULT_COMPACT_SCHEDULE,
        build_rows_schedule,
    )

    # normal case: both stages fit within 12 iterations
    rows, final = build_rows_schedule(((4, 0.5), (2, 0.25)), 512, 12)
    assert rows == ((4, 256), (2, 128)) and final == 6
    # a stage that would leave no iterations after it is dropped
    rows, final = build_rows_schedule(((4, 0.5), (2, 0.25)), 512, 6)
    assert rows == ((4, 256),) and final == 2
    # too few iterations for any stage: pure one-shot (final == all iters)
    rows, final = build_rows_schedule(((4, 0.5),), 512, 4)
    assert rows == () and final == 4
    # capacity floor of 64 rows (one sublane tile of frames)
    rows, final = build_rows_schedule(((4, 0.05),), 512, 12)
    assert rows == ((4, 64),) and final == 8
    # default schedule resolves to strictly decreasing multiples of 8
    rows, final = build_rows_schedule(DEFAULT_COMPACT_SCHEDULE, 512, 12)
    prev = 512
    for _, r in rows:
        assert r < prev and r % 8 == 0
        prev = r


def _regular_row_code(m, n, dc, seed):
    """Random H with every row weight exactly dc and no zero column."""
    rng = np.random.default_rng(seed)
    while True:
        h = np.zeros((m, n), np.uint8)
        for i in range(m):
            h[i, rng.choice(n, size=dc, replace=False)] = 1
        if h.sum(axis=0).min() >= 1:
            try:
                return Code.from_parity(h, f"regular_{m}_{n}_{dc}")
            except ValueError:
                continue


@pytest.mark.parametrize("m,n,dc", [(16, 32, 4), (32, 64, 4)])
def test_edge_decode_lane_packed_small_m(m, n, dc):
    """Lane-packing fold paths: (16,32,dc=4) packs P=4 slabs into one group
    (ngroups=1, two half-width folds, min2 seeded inside the fold);
    (32,64,dc=4) packs P=2 with ngroups=2.  Both must match the XLA golden."""
    code = _regular_row_code(m, n, dc, seed=11)
    llr = _llr(code, 32, seed=7)
    params = nms.init_params("NMS-1")
    ref = np.asarray(
        nms.decode_final(params, jnp.asarray(code.h, jnp.float32), llr, 8, "NMS-1")
    )
    got = np.asarray(
        decode_final_edge(params, code.h, llr, 8, "NMS-1",
                          block_frames=16, interpret=True, mode="highest")
    )
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_build_rows_schedule_always_valid():
    """Any (frac, block) pair must yield a schedule _mc_schedule_jit accepts
    (rows strictly decreasing in multiples of 8) or drop the stage — a
    user-supplied BENCH_FRAC like 0.3 at block 512 used to produce rows=153
    and crash inside the harness's fallback chain."""
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import (
        build_rows_schedule,
    )

    for block in (64, 128, 256, 512):
        for frac in (0.05, 0.3, 0.40625, 0.5, 0.77, 1.0, 2.0):
            for iters in (2, 5, 12):
                sched, final = build_rows_schedule(((4, frac),), block, iters)
                assert final >= 1
                rows_prev = block
                for it, rows in sched:
                    assert rows % 8 == 0
                    assert 64 <= rows < rows_prev
                    rows_prev = rows
    # multi-stage: capacities must keep decreasing even when fracs don't
    sched, final = build_rows_schedule(
        ((2, 0.9), (2, 0.95), (2, 0.5)), 512, 12
    )
    rows_prev = 512
    for _, rows in sched:
        assert rows % 8 == 0 and rows < rows_prev
        rows_prev = rows
    assert final == 12 - sum(it for it, _ in sched)


def test_edge_layout_rejects_degree_one_checks():
    import numpy as np
    import pytest

    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import edge_layout

    with pytest.raises(ValueError, match="check degree >= 2"):
        edge_layout(np.eye(4, 16, dtype=np.uint8))  # every row degree 1


def test_traj_edge_matches_xla_decode(code):
    """decode_traj_edge reproduces the full (T+1, B, n) nms.decode
    trajectory convention (slot 0 = channel input) at f32 tolerance, for
    every scalar variant and both row-chunk counts."""
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import (
        decode_traj_edge,
    )

    llr = _llr(code, 64, seed=5)
    for variant in ("NMS-1", "NMS-2", "NMS-3"):
        params = nms.init_params(variant)
        ref = np.asarray(
            nms.decode(params, jnp.asarray(code.h, jnp.float32), llr, 8,
                       variant)
        )
        got = np.asarray(
            decode_traj_edge(params, code.h, llr, 8, variant,
                             block_frames=32, interpret=True, mode="highest")
        )
        assert got.shape == ref.shape == (9, 64, code.n)
        np.testing.assert_array_equal(got[0], np.asarray(llr))  # channel slot
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-4, variant
        # hard decisions identical on every iteration slot
        np.testing.assert_array_equal(got <= 0, ref <= 0)


def test_traj_edge_irregular_code():
    """Trajectory kernel on an irregular-row code (dummy edges exercise the
    bias path inside the shared iteration body)."""
    from short_ldpc_decoding_osd_tpu.codes import make_regular_ldpc
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_pallas import (
        decode_traj_edge,
    )

    rng = np.random.default_rng(3)
    h = (rng.random((24, 48)) < 0.2).astype(np.uint8)
    h[np.arange(24), rng.integers(0, 48, 24)] = 1  # no empty rows
    code2 = Code.from_parity(h, name="irr_traj")
    llr = jnp.asarray(rng.normal(1.0, 0.9, (16, 48)), jnp.float32)
    params = nms.init_params("NMS-1")
    ref = np.asarray(
        nms.decode(params, jnp.asarray(code2.h, jnp.float32), llr, 6, "NMS-1")
    )
    got = np.asarray(
        decode_traj_edge(params, code2.h, llr, 6, "NMS-1",
                         block_frames=8, interpret=True, mode="highest")
    )
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-4
