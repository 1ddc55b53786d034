import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.codes import (
    Code,
    dump_alist,
    get_code,
    gf2,
    make_regular_ldpc,
    parse_alist,
)


def test_alist_roundtrip():
    rng = np.random.default_rng(0)
    h = (rng.random((10, 24)) < 0.3).astype(np.uint8)
    h[:, 0] = 1  # avoid zero-degree columns
    assert np.array_equal(parse_alist(dump_alist(h)), h)


def test_row_reduce_identity_block():
    rng = np.random.default_rng(1)
    for _ in range(20):
        m, n = 12, 28
        h = (rng.random((m, n)) < 0.4).astype(np.uint8)
        reduced, swaps = gf2.row_reduce(h)
        r = reduced.shape[0]
        # leading r x r block must be the identity after recorded swaps
        assert np.array_equal(reduced[:, :r], np.eye(r, dtype=np.uint8))
        # row space is preserved: reduced rows must satisfy the same codewords
        order = gf2.apply_swaps_to_index(n, swaps)
        h_swapped = h[:, order]
        # rank of stacked [h_swapped; reduced] equals rank of h
        stacked = np.concatenate([h_swapped, reduced], axis=0)
        assert gf2.rank(stacked) == gf2.rank(h_swapped) == r


def test_generator_orthogonality_ccsds():
    code = get_code("ccsds_128_64")
    assert (code.n, code.m, code.k) == (128, 64, 64)
    assert code.max_chk_degree == 8
    syndrome = code.h.astype(int) @ code.g.T.astype(int) % 2
    assert not syndrome.any()


def test_encode_codewords_satisfy_parity():
    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(2)
    msgs = rng.integers(0, 2, size=(50, code.k))
    words = code.encode(msgs)
    assert not (code.h.astype(int) @ words.T % 2).any()


def test_extended_enms_rows():
    # CCSDS rows overlap in at most 1 position, so under the reference's rule
    # (pair weight <= 2*dc-4, i.e. overlap >= 2) no rows qualify there;
    # exercise the extension on a code that does have overlapping rows.
    h = np.array(
        [[1, 1, 1, 1, 0, 0, 0], [1, 1, 0, 0, 1, 1, 0], [0, 0, 1, 0, 1, 0, 1]],
        dtype=np.uint8,
    )
    code = Code.from_parity(h, "tiny")
    ext = code.extended()
    cap = 2 * code.max_chk_degree - 4
    assert ext.m > code.m
    extra = ext.h[code.m :]
    assert (extra.sum(axis=1) <= cap).all()
    # extra rows still orthogonal to G
    assert not (extra.astype(int) @ code.g.T.astype(int) % 2).any()
    # and the CCSDS extension is a no-op, matching the reference rule
    ccsds = get_code("ccsds_128_64")
    assert ccsds.extended().m == ccsds.m


@pytest.mark.parametrize("name", ["regular_256_128", "regular_512_256"])
def test_regular_code_construction(name):
    code = get_code(name)
    assert code.k == code.n - code.m
    assert not (code.h.astype(int) @ code.g.T.astype(int) % 2).any()


def test_custom_code_from_parity():
    # (7,4) Hamming
    h = np.array(
        [[1, 0, 1, 0, 1, 0, 1], [0, 1, 1, 0, 0, 1, 1], [0, 0, 0, 1, 1, 1, 1]],
        dtype=np.uint8,
    )
    code = Code.from_parity(h, "hamming_7_4")
    assert code.k == 4
    msgs = np.array([[1, 0, 1, 1]])
    assert not (h.astype(int) @ code.encode(msgs).T % 2).any()


def test_make_regular_full_rank():
    code = make_regular_ldpc(64, 32, row_weight=6, seed=5)
    assert gf2.rank(code.h) == 32


_PACKAGED = {
    "array_121_60": (121, 66, 60),
    "array_121_80": (121, 44, 80),
    "qc_96_48": (96, 48, 48),
    "code1_64_32": (64, 32, 32),
    "wimax_1056_880": (1056, 176, 880),
    "wimaxlike_384_192": (384, 192, 192),
}


@pytest.mark.parametrize("name", sorted(_PACKAGED))
def test_packaged_code_assets(name):
    """Every packaged public code loads, G is orthogonal to H, and encoded
    codewords satisfy parity.  array_121_* carry redundant parity rows
    (m > rank), exercising the rank-deficient generator construction."""
    code = get_code(name)
    n, m, k = _PACKAGED[name]
    assert (code.n, code.m, code.k) == (n, m, k)
    syndrome = code.h.astype(int) @ code.g.T.astype(int) % 2
    assert not syndrome.any()
    rng = np.random.default_rng(7)
    msgs = rng.integers(0, 2, size=(8, code.k))
    assert not (code.h.astype(int) @ code.encode(msgs).T % 2).any()


@pytest.mark.parametrize("name", ["array_121_60", "qc_96_48", "wimaxlike_384_192"])
def test_packaged_code_nms_decodes(name):
    """A clean (noise-free) BPSK frame must decode to itself for the packaged
    codes, including the rank-deficient array code (extra check rows are
    legitimate BP checks)."""
    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.ops import nms

    code = get_code(name)
    rng = np.random.default_rng(11)
    words = code.encode(rng.integers(0, 2, size=(4, code.k)))
    llr = jnp.asarray(1.0 - 2.0 * words, jnp.float32)  # noise-free BPSK
    soft = nms.decode_final(
        nms.init_params("NMS-1"), jnp.asarray(code.h, jnp.float32), llr, 4, "NMS-1"
    )
    hard = np.asarray(soft < 0, np.uint8)
    np.testing.assert_array_equal(hard, words.astype(np.uint8))


def test_row_basis_and_h_osd():
    """Full-rank row basis for the OSD elimination: same row space as the
    redundant-row matrix, and the reduced basis spans exactly the rows the
    reference's delete-zero-rows elimination would keep.  (The column-swap
    *record* may differ in degenerate steps — a documented conscious
    divergence, see gf2.row_basis.)"""
    code = get_code("array_121_60")
    assert code.m == 66 and code.k == 60
    basis = code.h_osd
    assert basis.shape == (61, 121)
    # rows of the basis are original H rows and span the same row space
    as_set = {tuple(r) for r in code.h.tolist()}
    assert all(tuple(r) in as_set for r in basis.tolist())
    stacked = np.concatenate([code.h, basis], axis=0)
    assert gf2.rank(stacked) == gf2.rank(code.h) == 61
    # the permuted reductions agree whenever no degenerate step occurs (the
    # generic case: most reliability permutations)
    rng = np.random.default_rng(0)
    agree = 0
    for _ in range(5):
        perm = rng.permutation(code.n)
        red_full, swaps_full = gf2.row_reduce(code.h[:, perm])
        red_basis, swaps_basis = gf2.row_reduce(basis[:, perm])
        if swaps_full == swaps_basis:
            np.testing.assert_array_equal(red_full, red_basis)
            agree += 1
        # always: same rank, same pivot structure
        assert red_full.shape == red_basis.shape == (61, 121)
    assert agree >= 3
    # full-rank codes: h_osd is h itself
    ccsds = get_code("ccsds_128_64")
    assert ccsds.h_osd is ccsds.h


def test_osd_prepare_rank_deficient_code():
    """The fixed-shape OSD pipeline runs on the rank-deficient array code via
    h_osd: at high SNR the zero-TEP candidate equals the transmitted word,
    so the truth discrepancy matches the order-0 block minimum."""
    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.osd import engine, segments

    code = get_code("array_121_60")
    rng = np.random.default_rng(1)
    B = 16
    words = code.encode(rng.integers(0, 2, (B, code.k)))
    llr = jnp.asarray((1.0 - 2.0 * words) + rng.normal(0, 0.35, (B, code.n)),
                      jnp.float32)
    labs = jnp.asarray(words, jnp.int32)
    prep = engine.prepare(llr, llr, labs, jnp.asarray(code.h_osd), code.k)
    assert prep.m_matrix.shape == (B, code.n - code.k, code.k)
    blocks, _ = segments.build_tep_blocks([[0] * 6], code.k, 6)
    teps, mask = segments.stack_padded_blocks(blocks)
    minima, _ = engine.block_discrepancy_minima(
        prep, jnp.asarray(teps), jnp.asarray(mask), code.k
    )
    # at this noise level nearly every frame's MRB is error-free: the
    # zero-TEP discrepancy must then equal the truth discrepancy
    agree = np.isclose(
        np.asarray(minima)[:, 0], np.asarray(prep.truth_discrepancy), rtol=1e-5
    )
    assert agree.mean() >= 0.8
