import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.baselines import common, conventional, fs_osd, pb_osd
from short_ldpc_decoding_osd_tpu.codes import get_code, make_regular_ldpc

import golden_baselines as gb


@pytest.fixture(scope="module")
def small_code():
    return make_regular_ldpc(48, 24, row_weight=6, seed=9)


def _noisy_batch(code, batch, snr_db, seed):
    rng = np.random.default_rng(seed)
    words = code.encode(rng.integers(0, 2, (batch, code.k)))
    sigma = np.sqrt(1.0 / (2 * code.rate * 10 ** (snr_db / 10)))
    rx = 1.0 + sigma * rng.standard_normal((batch, code.n))
    llr = np.where(words == 0, rx, -rx).astype(np.float32)
    return llr, words.astype(np.int32)


def test_prepare_g_domain_matches_host(small_code):
    code = small_code
    llr, words = _noisy_batch(code, 6, 2.0, 0)
    prep = common.prepare_g_domain(
        jnp.asarray(llr), jnp.asarray(words), jnp.asarray(code.g), code.k
    )
    for i in range(6):
        in_ref, lab_ref, p_ref = gb.host_prepare_g(llr[i], words[i], code.g, code.k)
        np.testing.assert_allclose(np.asarray(prep["inputs"][i]), in_ref, rtol=1e-6)
        assert np.array_equal(np.asarray(prep["labels"][i]), lab_ref)
        assert np.array_equal(np.asarray(prep["p_matrix"][i]), p_ref)
        # prepared G-domain consistency: label mrb re-encodes to label lrb
        lab_mrb = lab_ref[: code.k]
        assert np.array_equal((lab_mrb @ p_ref) % 2, lab_ref[code.k :])


def test_tep_distances_affine_map(small_code):
    code = small_code
    llr, words = _noisy_batch(code, 4, 2.0, 1)
    prep = common.prepare_g_domain(
        jnp.asarray(llr), jnp.asarray(words), jnp.asarray(code.g), code.k
    )
    terms = common.candidate_distance_terms(prep, code.k)
    teps = pb_osd.weight_limited_teps(code.k, 2)[:40]
    wd, hd, _ = common.tep_distances(terms, jnp.asarray(teps), prep["p_matrix"])
    for i in range(4):
        in_ref, _, p_ref = gb.host_prepare_g(llr[i], words[i], code.g, code.k)
        hard = np.where(in_ref > 0, 0, 1)
        mag = np.abs(in_ref)
        mrb0 = hard[: code.k]
        for t in range(0, 40, 7):
            wd_ref, hd_ref, _ = gb._dist(
                teps[t].astype(int), mrb0, None, p_ref, hard, mag
            )
            assert float(wd[i, t]) == pytest.approx(wd_ref, rel=1e-4), (i, t)
            assert float(hd[i, t]) == pytest.approx(hd_ref, abs=0.5), (i, t)


def test_fs_osd_matches_golden(small_code):
    code = small_code
    llr, words = _noisy_batch(code, 24, 1.5, 2)
    order_limit, beta, tau_psc = 2, 0.1, 10
    tau_e = 2.0  # (d_min unknown for the random code; any threshold works)
    out = fs_osd.fs_osd(
        jnp.asarray(llr), jnp.asarray(words), code.g, code.k,
        order_limit=order_limit, beta=beta, d_min=int(2 * tau_e + 1),
        tau_psc=tau_psc, chunk=128,
    )
    teps, starts = fs_osd.sequential_tep_matrix(code.k, order_limit)
    for i in range(24):
        in_ref, lab_ref, p_ref = gb.host_prepare_g(llr[i], words[i], code.g, code.k)
        ok_ref, num_ref = gb.fs_golden(
            in_ref, lab_ref, p_ref, code.k, teps, starts, order_limit,
            beta, tau_e, tau_psc,
        )
        assert bool(out["success"][i]) == bool(ok_ref), i
        assert int(out["num_teps"][i]) == num_ref, i


def test_pb_osd_matches_golden(small_code):
    code = small_code
    llr, words = _noisy_batch(code, 16, 1.5, 3)
    order_limit = 2
    out = pb_osd.pb_osd(
        jnp.asarray(llr), jnp.asarray(words), code.g, code.k,
        snr_db=1.5, order_limit=order_limit, chunk=128,
    )
    teps = pb_osd.weight_limited_teps(code.k, order_limit)
    for i in range(16):
        in_ref, lab_ref, p_ref = gb.host_prepare_g(llr[i], words[i], code.g, code.k)
        ok_ref, cost_ref = gb.pb_golden(
            in_ref, lab_ref, p_ref, code.k, teps, 1.5, order_limit
        )
        assert bool(out["success"][i]) == bool(ok_ref), i
        assert int(out["num_teps"][i]) == cost_ref, i


def test_conventional_osd_order1_perfect_on_single_error():
    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(4)
    words = code.encode(rng.integers(0, 2, (8, code.k)))
    llr = np.where(words == 0, 2.0, -2.0).astype(np.float32)
    llr += rng.normal(0, 0.05, llr.shape).astype(np.float32)
    out = conventional.conventional_osd(
        jnp.asarray(llr), jnp.asarray(words), code.g, code.k, order_limit=1
    )
    assert np.asarray(out["success"]).all()
    assert (np.asarray(out["phase"]) == 0).all()  # zero-TEP wins on clean frames


def test_miracle_view_counts(small_code):
    code = small_code
    llr, words = _noisy_batch(code, 64, 3.0, 5)
    counter = conventional.miracle_view(
        jnp.asarray(llr), jnp.asarray(words), code.g, code.k
    )
    assert sum(counter.values()) == 64
    floor0 = conventional.miracle_fer_floor(counter, 0)
    floor2 = conventional.miracle_fer_floor(counter, 2)
    assert 0.0 <= floor2 <= floor0 <= 1.0


def test_pb_pop_order_matches_dynamic_queue():
    """The static ascending-reliability visiting order IS the reference's
    dynamic priority-queue pop order (pb_testing.py:339-397), and the
    maintained-list comparison counters follow the static successor tree."""
    k, order_limit = 12, 3
    rng = np.random.default_rng(11)
    mag = np.sort(rng.uniform(0.05, 3.0, k))[::-1].copy()  # descending MRB
    teps = pb_osd.weight_limited_teps(k, order_limit)
    n_teps = len(teps)
    # static order: ascending reliability sum, ties by enumeration index
    rels = teps @ mag
    static_order = np.argsort(rels, kind="stable")
    popped, counters, _ = gb.pb_queue_golden(mag, order_limit, n_teps)
    static_tuples = [tuple(np.nonzero(teps[i])[0]) for i in static_order]
    assert popped == static_tuples
    # static push-count simulation reproduces the per-pop counters
    pushes = pb_osd._tep_push_counts(teps, k, order_limit)[static_order]
    size_before = 1 + np.cumsum(pushes) - pushes - np.arange(n_teps)
    static_counters = np.where(size_before <= 1, 1, 2)
    assert list(static_counters) == counters
    # the queue drains exactly at the last pop (tree covers all TEPs once)
    assert size_before[-1] == 1


def test_pb_maintained_list_metric_matches_queue():
    """pb_osd's maintained_list output equals the dynamic-queue accounting
    truncated at the stop (memory_sum in pb_testing.py:120-122,166)."""
    code = make_regular_ldpc(32, 16, row_weight=4, seed=5)
    llr, words = _noisy_batch(code, 8, 1.5, 7)
    order_limit = 2
    out = pb_osd.pb_osd(
        jnp.asarray(llr), jnp.asarray(words), code.g, code.k,
        snr_db=1.5, order_limit=order_limit, chunk=64,
    )
    teps = pb_osd.weight_limited_teps(code.k, order_limit)
    n_max = 1 + len(teps)
    for i in range(8):
        in_ref, _, _ = gb.host_prepare_g(llr[i], words[i], code.g, code.k)
        mag = np.abs(in_ref[: code.k])
        cost = int(out["num_teps"][i])
        pops = cost if cost < n_max else n_max - 1
        _, counters, _ = gb.pb_queue_golden(mag, order_limit, pops)
        assert int(out["maintained_list"][i]) == sum(counters), i


def test_fs_literal_vs_intended_tau_e_scoring(small_code):
    """score_tau_e_codeword=False reproduces the reference's literal
    line-162 scoring: on a tau_e mid-search stop the stale best-so-far is
    judged, not the tau_e codeword (fs_testing.py:143-162)."""
    code = small_code
    llr, words = _noisy_batch(code, 32, 1.0, 12)
    kw = dict(order_limit=2, beta=0.1, d_min=5, tau_psc=10, chunk=128)
    out_i = fs_osd.fs_osd(
        jnp.asarray(llr), jnp.asarray(words), code.g, code.k,
        score_tau_e_codeword=True, **kw)
    out_l = fs_osd.fs_osd(
        jnp.asarray(llr), jnp.asarray(words), code.g, code.k,
        score_tau_e_codeword=False, **kw)
    # counting is identical in both modes
    np.testing.assert_array_equal(
        np.asarray(out_i["num_teps"]), np.asarray(out_l["num_teps"]))
    # scoring may only differ on tau_e mid-search frames
    diff = np.asarray(out_i["success"]) != np.asarray(out_l["success"])
    tau_e_frames = np.asarray(out_i["tau_e_stop"])
    assert not np.any(diff & ~tau_e_frames)


def test_large_k_tep_sets_rejected_with_guidance():
    """C(880,3) ~ 113M TEP rows would OOM the host; the full-enumeration
    baselines fail fast with a pointer to the learned path instead."""
    with pytest.raises(ValueError, match="impractical"):
        pb_osd.weight_limited_teps(880, 3)
    with pytest.raises(ValueError, match="impractical"):
        fs_osd.sequential_tep_matrix(880, 3)
