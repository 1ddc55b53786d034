"""Tests for the batched experimental OSD entry points (osd/experimental.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.codes import gf2
from short_ldpc_decoding_osd_tpu.osd import engine, experimental
from short_ldpc_decoding_osd_tpu.osd.segments import expand_pattern


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


@pytest.fixture(scope="module")
def prep(code):
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 2, (24, code.k))
    cw = code.encode(msgs)
    rx = (1 - 2 * cw) + 0.7 * rng.standard_normal((24, code.n))
    return engine.prepare(
        jnp.asarray(rx, jnp.float32),
        jnp.asarray(rx, jnp.float32),
        jnp.asarray(cw, jnp.int8),
        jnp.asarray(code.h, jnp.float32),
        code.k,
    )


def test_medium_row_echelon_properties(code):
    red, dep = experimental.medium_row_echelon(code.h)
    assert not dep  # full-rank H with n > m: every row finds a pivot
    # echelon: pivot column of each row strictly increases
    pivots = [np.nonzero(r)[0][0] for r in red if r.any()]
    assert all(a < b for a, b in zip(pivots, pivots[1:]))
    # rank preserved
    assert gf2.rank(red) == gf2.rank(code.h)
    # dependent columns are reported when a column repeats early
    h2 = np.array(code.h)
    h2[:, 1] = h2[:, 0]
    _, dep2 = experimental.medium_row_echelon(h2)
    assert 1 in dep2


def test_swap_statistics(code):
    rng = np.random.default_rng(1)
    updated = jnp.asarray(rng.normal(1.0, 0.8, (16, code.n)), jnp.float32)
    hist, initial = experimental.swap_statistics(
        updated, jnp.asarray(code.h, jnp.float32), code.k, n_s=0
    )
    assert sum(hist.values()) == 16
    swap_lens = np.repeat(
        np.fromiter(hist.keys(), dtype=int), np.fromiter(hist.values(), dtype=int)
    )
    # frames with zero swaps report -1; others a rank in the swapped region
    assert ((initial == -1) | (initial >= code.n - code.k)).all()
    assert (initial >= 0).sum() == (swap_lens > 0).sum()


def test_combination_block_counts():
    from math import comb

    blk = experimental.combination_block(10, 2, 7, 2)
    assert blk.shape == (comb(5, 2), 10)
    assert (blk.sum(axis=1) == 2).all()
    assert blk[:, :2].sum() == 0 and blk[:, 7:].sum() == 0
    zero = experimental.combination_block(10, 2, 7, 0)
    assert zero.shape == (1, 10) and zero.sum() == 0


def test_tailored_pattern_matches_expand(code):
    k = code.k
    ranges = [range(0, 4), range(4, 10), range(10, k)]
    direction = [1, 2, 0]
    seg_blocks = [
        [
            experimental.combination_block(k, r.start, r.stop, lvl)
            for lvl in range(3)
        ]
        for r in ranges
    ]
    tailored = experimental.tailored_pattern(direction, seg_blocks)
    expanded = expand_pattern(direction, ranges, k)
    assert tailored.shape == expanded.shape
    assert set(map(tuple, tailored.tolist())) == set(map(tuple, expanded.tolist()))


def test_candidate_matrix_valid_codewords(code, prep):
    teps = jnp.asarray(
        np.concatenate(
            [
                np.zeros((1, code.k), np.int8),
                experimental.combination_block(code.k, code.k - 5, code.k, 1),
            ]
        )
    )
    cand = np.asarray(experimental.candidate_matrix(prep, teps, code.k))
    # every candidate satisfies the permuted parity checks [I | M]
    m_mat = np.asarray(prep.m_matrix)
    for b in range(0, cand.shape[0], 7):
        synd = (cand[b, :, : code.n - code.k] + cand[b, :, code.n - code.k :] @ m_mat[b].T) % 2
        assert not synd.any()


def test_best_estimation_counts_noiseless(code):
    rng = np.random.default_rng(2)
    msgs = rng.integers(0, 2, (8, code.k))
    cw = code.encode(msgs)
    llr = jnp.asarray((1 - 2 * cw).astype(np.float32))
    prep = engine.prepare(
        llr, llr, jnp.asarray(cw, jnp.int8), jnp.asarray(code.h, jnp.float32), code.k
    )
    teps = jnp.asarray(
        np.concatenate(
            [
                np.zeros((1, code.k), np.int8),
                experimental.combination_block(code.k, 0, code.k, 1),
            ]
        )
    )
    correct, fail = experimental.best_estimation_counts(prep, teps, code.k)
    assert (correct, fail) == (8, 0)
