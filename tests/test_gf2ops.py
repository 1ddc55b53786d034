import jax.numpy as jnp
import numpy as np

from short_ldpc_decoding_osd_tpu.codes import get_code, gf2
from short_ldpc_decoding_osd_tpu.ops import gf2ops


def _host_identify_mrb(h_sorted, k):
    """Host-side MRB identification with reference semantics, for comparison."""
    reduced, swaps = gf2.row_reduce(h_sorted.copy())
    n = h_sorted.shape[1]
    order = gf2.apply_swaps_to_index(n, swaps)
    mrb = order[-k:]
    sort_idx = np.argsort(mrb)
    index_order = np.concatenate([order[: n - k], np.sort(mrb)])
    m_matrix = reduced[:, -k:][:, sort_idx]
    swap_len = int((mrb < n - k).sum())
    return m_matrix, index_order, swap_len


def _random_sorted_h(code, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(code.n)
    return code.h[:, perm].astype(np.uint8)


def test_batched_row_reduce_matches_host():
    code = get_code("ccsds_128_64")
    batch = [_random_sorted_h(code, s) for s in range(8)]
    reduced_b, order_b = gf2ops.batched_row_reduce(jnp.asarray(np.stack(batch)))
    for i, h in enumerate(batch):
        host_reduced, swaps = gf2.row_reduce(h.copy())
        host_order = gf2.apply_swaps_to_index(code.n, swaps)
        assert np.array_equal(np.asarray(reduced_b[i]), host_reduced), f"frame {i}"
        assert np.array_equal(np.asarray(order_b[i]), host_order), f"frame {i}"


def test_identify_mrb_matches_host():
    code = get_code("ccsds_128_64")
    batch = [_random_sorted_h(code, 100 + s) for s in range(6)]
    out = gf2ops.identify_mrb(jnp.asarray(np.stack(batch)), code.k)
    for i, h in enumerate(batch):
        m_ref, order_ref, swap_ref = _host_identify_mrb(h, code.k)
        assert np.array_equal(np.asarray(out["m_matrix"][i]), m_ref)
        assert np.array_equal(np.asarray(out["index_order"][i]), order_ref)
        assert int(out["swap_len"][i]) == swap_ref


def test_identify_mrb_reencode_property():
    """Any codeword's MRB bits re-encode to its LRB bits through m_matrix."""
    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(7)
    words = code.encode(rng.integers(0, 2, size=(4, code.k)))
    llr = rng.normal(0, 1, size=(4, code.n)).astype(np.float32)
    perm, h_p = gf2ops.reliability_sort(jnp.asarray(llr), jnp.asarray(code.h))
    out = gf2ops.identify_mrb(h_p, code.k)
    for i in range(4):
        order = np.asarray(perm[i])[np.asarray(out["index_order"][i])]
        word = words[i][order]
        mrb = word[-code.k :]
        lrb = word[: code.n - code.k]
        lrb_pred = np.asarray(out["m_matrix"][i]).astype(int) @ mrb % 2
        assert np.array_equal(lrb_pred, lrb)


def test_mod2_matmul():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2, (16, 64))
    b = rng.integers(0, 2, (64, 32))
    got = np.asarray(gf2ops.mod2_matmul(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, a @ b % 2)
