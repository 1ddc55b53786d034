"""Bit-packed GE (frames-as-lanes, columns-as-bits) vs the XLA golden."""

import jax.numpy as jnp
import numpy as np

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import gf2ops
from short_ldpc_decoding_osd_tpu.ops.gf2_bitpack import (
    batched_row_reduce_bitpack,
    pack_columns,
    unpack_columns,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for n in (24, 32, 121, 128):
        x = rng.integers(0, 2, (5, 16, n)).astype(np.uint8)
        packed = pack_columns(jnp.asarray(x))
        assert packed.shape == (16, -(-n // 32), 5)
        np.testing.assert_array_equal(np.asarray(unpack_columns(packed, n)), x)


def test_bitpack_ge_matches_xla_ccsds():
    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(1)
    batch = np.stack(
        [code.h[:, rng.permutation(code.n)] for _ in range(48)]
    ).astype(np.uint8)
    want_mat, want_ord = gf2ops.batched_row_reduce(jnp.asarray(batch))
    got_mat, got_ord = batched_row_reduce_bitpack(jnp.asarray(batch))
    np.testing.assert_array_equal(np.asarray(got_mat), np.asarray(want_mat))
    np.testing.assert_array_equal(np.asarray(got_ord), np.asarray(want_ord))


def test_bitpack_ge_forced_column_swaps():
    """Duplicate early columns so the diagonal walk must record swaps."""
    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(2)
    frames = []
    for _ in range(32):
        h = code.h[:, rng.permutation(code.n)].copy()
        j = int(rng.integers(1, 40))
        h[:, j] = h[:, j - 1]
        frames.append(h)
    batch = np.stack(frames).astype(np.uint8)
    want_mat, want_ord = gf2ops.batched_row_reduce(jnp.asarray(batch))
    got_mat, got_ord = batched_row_reduce_bitpack(jnp.asarray(batch))
    np.testing.assert_array_equal(np.asarray(got_mat), np.asarray(want_mat))
    np.testing.assert_array_equal(np.asarray(got_ord), np.asarray(want_ord))


def test_bitpack_ge_word_boundary_swaps():
    """Swaps that cross int32 word boundaries (t in word 0/1, source in a
    later word), exercised with the (96,48) QC code (n=96 -> 3 words)."""
    code = get_code("qc_96_48")
    rng = np.random.default_rng(3)
    frames = []
    for _ in range(16):
        h = code.h[:, rng.permutation(code.n)].copy()
        # duplicate columns 30->31 and 62->63 (straddle word edges)
        h[:, 31] = h[:, 30]
        h[:, 63] = h[:, 62]
        frames.append(h)
    batch = np.stack(frames).astype(np.uint8)
    want_mat, want_ord = gf2ops.batched_row_reduce(jnp.asarray(batch))
    got_mat, got_ord = batched_row_reduce_bitpack(jnp.asarray(batch))
    np.testing.assert_array_equal(np.asarray(got_mat), np.asarray(want_mat))
    np.testing.assert_array_equal(np.asarray(got_ord), np.asarray(want_ord))


def test_bitpack_ge_nonmultiple_of_32_columns():
    """n=45: the last packed word is partial; padding bits must stay inert.
    Frames are filtered to full GF(2) row rank (degenerate steps are a
    documented no-op, not bit-matched against the XLA kernel)."""
    from short_ldpc_decoding_osd_tpu.codes import gf2

    rng = np.random.default_rng(4)
    frames = []
    while len(frames) < 8:
        h = (rng.uniform(size=(16, 45)) < 0.4).astype(np.uint8)
        if gf2.rank(h) == 16:
            frames.append(h)
    batch = np.stack(frames)
    want_mat, want_ord = gf2ops.batched_row_reduce(jnp.asarray(batch))
    got_mat, got_ord = batched_row_reduce_bitpack(jnp.asarray(batch))
    np.testing.assert_array_equal(np.asarray(got_mat), np.asarray(want_mat))
    np.testing.assert_array_equal(np.asarray(got_ord), np.asarray(want_ord))



def test_pack_permuted_matches_dense_pack():
    """MXU-composed permute+pack == dense permute then pack_columns."""
    from short_ldpc_decoding_osd_tpu.ops.gf2_bitpack import pack_permuted

    rng = np.random.default_rng(7)
    for name in ("ccsds_128_64", "array_121_60"):
        code = get_code(name)
        b = 6
        perm = np.stack([rng.permutation(code.n) for _ in range(b)])
        invperm = np.argsort(perm, axis=1)
        got = pack_permuted(jnp.asarray(invperm), jnp.asarray(code.h))
        dense = np.stack([code.h[:, p] for p in perm]).astype(np.uint8)
        want = pack_columns(jnp.asarray(dense))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_unpack_tail_columns_matches_full_unpack():
    from short_ldpc_decoding_osd_tpu.ops.gf2_bitpack import unpack_tail_columns

    rng = np.random.default_rng(8)
    for n, k in ((128, 64), (121, 60), (121, 33), (96, 48)):
        x = rng.integers(0, 2, (4, 16, n)).astype(np.uint8)
        packed = pack_columns(jnp.asarray(x))
        got = unpack_tail_columns(packed, n, k)
        np.testing.assert_array_equal(
            np.asarray(got), x[:, :, n - k:].astype(np.int8)
        )


def test_identify_mrb_from_perm_matches_dense():
    """Packed fused path == dense identify_mrb, bitwise, incl. rank-deficient
    H (array_121_60 h_osd is full-rank basis; use raw h for the deficient
    case via the dense reducer's no-pivot no-op semantics)."""
    rng = np.random.default_rng(9)
    for name in ("ccsds_128_64", "array_121_60"):
        code = get_code(name)
        h = code.h_osd if hasattr(code, "h_osd") and code.h_osd is not None \
            else code.h
        k = code.n - h.shape[0]
        b = 5
        llr = rng.normal(0, 1, (b, code.n)).astype(np.float32)
        perm = jnp.argsort(jnp.abs(jnp.asarray(llr)), axis=-1, stable=True)
        want = gf2ops.identify_mrb_from_perm(
            perm, jnp.asarray(h), k, use_packed=False
        )
        got = gf2ops.identify_mrb_from_perm(
            perm, jnp.asarray(h), k, use_packed=True
        )
        for key in ("m_matrix", "index_order", "swap_len", "lrb_ranks"):
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(want[key]), err_msg=key
            )
        # and the dense helper agrees with the h_p route
        via_dense = gf2ops.identify_mrb(
            gf2ops.permute_columns(perm, jnp.asarray(h)), k
        )
        for key in ("m_matrix", "index_order", "swap_len", "lrb_ranks"):
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(via_dense[key]), err_msg=key
            )
