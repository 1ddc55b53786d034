import math

import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.osd import engine, path, segments

import golden_osd


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


def test_segment_sizes_k64():
    sizes = segments.segment_sizes(64)
    assert sizes.tolist() == [1, 4, 8, 12, 16, 23]
    assert segments.segment_boundaries(64).tolist() == [0, 1, 5, 13, 25, 41, 64]


def test_tep_block_counts():
    sizes = segments.segment_sizes(64)
    ranges = segments.ranges_from_boundaries(segments.segment_boundaries(64))
    for pattern in ([0, 0, 0, 0, 0, 0], [1, 0, 1, 0, 0, 1], [0, 2, 0, 1, 0, 0]):
        block = segments.expand_pattern(pattern, ranges, 64)
        expect = int(
            np.prod([math.comb(int(s), int(w)) for s, w in zip(sizes, pattern)])
        )
        assert block.shape == (expect, 64)
        # every row has exactly the per-segment weights requested
        b = segments.segment_boundaries(64)
        for s, w in enumerate(pattern):
            assert (block[:, b[s] : b[s + 1]].sum(axis=1) == w).all()
        # all rows distinct
        assert len({r.tobytes() for r in block}) == expect


def _failure_like_batch(code, batch, seed):
    """LLR pairs that look like decoder failures (some low-reliability bits)."""
    rng = np.random.default_rng(seed)
    words = code.encode(rng.integers(0, 2, (batch, code.k)))
    noise = rng.normal(0, 1.0, (batch, code.n))
    original = np.where(words == 0, 1.0, -1.0) * 0.9 + noise
    updated = original * 2.2 + rng.normal(0, 0.7, (batch, code.n))
    return (
        updated.astype(np.float32),
        original.astype(np.float32),
        words.astype(np.int32),
    )


def test_block_minima_match_golden(code):
    updated, original, words = _failure_like_batch(code, 5, 11)
    decoding_path = [[0, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
                     [1, 1, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0], [0, 2, 0, 0, 0, 0],
                     [0, 0, 0, 1, 0, 0]]
    blocks, acc = segments.build_tep_blocks(decoding_path, code.k)
    teps, mask = segments.stack_padded_blocks(blocks)
    prep = engine.prepare(
        jnp.asarray(updated),
        jnp.asarray(original),
        jnp.asarray(words),
        jnp.asarray(code.h),
        code.k,
    )
    minima, _ = engine.block_discrepancy_minima(
        prep, jnp.asarray(teps), jnp.asarray(mask), code.k
    )
    for i in range(updated.shape[0]):
        m_mat, hard_o, hard_u, mag, truth = golden_osd.prepare_frame(
            updated[i], original[i], words[i], code.h, code.k
        )
        want = golden_osd.block_minima_frame(m_mat, hard_o, hard_u, mag, blocks, code.k)
        np.testing.assert_allclose(np.asarray(minima[i]), want, rtol=2e-5, atol=2e-4)
        assert float(prep.truth_discrepancy[i]) == pytest.approx(truth, rel=1e-5)


def test_sliding_walk_matches_serial(code):
    rng = np.random.default_rng(5)
    num_blocks = 12
    minima = rng.uniform(1.0, 8.0, size=(16, num_blocks)).astype(np.float32)
    # make some frames have an obvious early min so the stopper can fire
    minima[::3, 1] = 0.2
    w1 = rng.normal(0, 0.6, (6, 6)).astype(np.float32)
    w2 = rng.normal(0, 0.6, (6, 2)).astype(np.float32)
    out = engine.sliding_walk(
        jnp.asarray(minima), {"w1": jnp.asarray(w1), "w2": jnp.asarray(w2)},
        window=5, soft_margin=0.6,
    )
    for i in range(minima.shape[0]):
        ref = golden_osd.serial_walk(list(minima[i]), w1, w2, 5, 0.6)
        assert float(out["global_min"][i]) == pytest.approx(ref["global_min"], rel=1e-6), i
        assert int(out["deep_limit"][i]) == ref["deep_limit"], i
        assert int(out["window_num"][i]) == ref["window_num"], i
        assert int(out["windows_evaluated"][i]) == ref["evals"], i


def test_full_sliding_osd_runs(code):
    updated, original, words = _failure_like_batch(code, 8, 21)
    decoding_path = [[0] * 6, [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
                     [0, 0, 1, 0, 0, 0], [1, 1, 0, 0, 0, 0], [0, 0, 0, 1, 0, 0],
                     [0, 2, 0, 0, 0, 0], [1, 0, 1, 0, 0, 0]]
    blocks, acc = segments.build_tep_blocks(decoding_path, code.k)
    teps, mask = segments.stack_padded_blocks(blocks)
    prep = engine.prepare(
        jnp.asarray(updated), jnp.asarray(original), jnp.asarray(words),
        jnp.asarray(code.h), code.k,
    )
    rng = np.random.default_rng(0)
    fcn = {
        "w1": jnp.asarray(rng.normal(0, 0.4, (6, 6)), jnp.float32),
        "w2": jnp.asarray(rng.normal(0, 0.4, (6, 2)), jnp.float32),
    }
    out = engine.sliding_osd(prep, jnp.asarray(teps), jnp.asarray(mask), acc, fcn, code.k)
    assert out["success"].shape == (8,)
    assert (np.asarray(out["complexity"]) >= 1).all()
    assert (np.asarray(out["deep_limit"]) <= len(blocks)).all()


def test_pattern_counter_path():
    pc = path.PatternCounter(64)
    pc.update(np.asarray([[0, 1, 0, 0, 0, 0]] * 10 + [[0, 0, 0, 0, 0, 1]] * 12))
    # [0,...,1] has block size C(23,1)=23 -> ratio 12/23; [0,1,...] C(4,1)=4 -> 10/4
    ranked = pc.decoding_path(threshold_sum=3, decoding_length=10)
    assert ranked[0] == [0, 1, 0, 0, 0, 0]
    assert ranked[1] == [0, 0, 0, 0, 0, 1]


def test_mrb_patterns_zero_for_clean_frames(code):
    rng = np.random.default_rng(3)
    words = code.encode(rng.integers(0, 2, (6, code.k)))
    clean = np.where(words == 0, 4.0, -4.0).astype(np.float32)
    patterns, swap_len = path.mrb_error_patterns(
        jnp.asarray(clean), jnp.asarray(words), jnp.asarray(code.h), code.k
    )
    assert not np.asarray(patterns).any()


def test_dl_osd_step_matches_chained(code):
    """The fully-jitted step (refine_fast -> prepare -> sliding_osd) agrees
    with the chained calls using the same fast refiner."""
    import jax

    from short_ldpc_decoding_osd_tpu.models import make_dia

    t1 = 7  # conv stack needs T+1 >= 7 (three valid k=3 convs)
    rng = np.random.default_rng(7)
    _, original, words = _failure_like_batch(code, 8, 7)
    traj = np.stack(
        [original + rng.normal(0, 0.3, original.shape) for _ in range(t1)], axis=1
    ).astype(np.float32)
    model = make_dia("model_cnn", code.n, t1)
    dia_params = model.init(jax.random.PRNGKey(0), jnp.zeros((code.n, t1, 1)))
    decoding_path = [[0] * 6, [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
                     [0, 0, 1, 0, 0, 0], [1, 1, 0, 0, 0, 0], [0, 0, 0, 1, 0, 0],
                     [0, 2, 0, 0, 0, 0], [1, 0, 1, 0, 0, 0]]
    blocks, acc = segments.build_tep_blocks(decoding_path, code.k)
    teps, mask = segments.stack_padded_blocks(blocks)
    fcn_rng = np.random.default_rng(1)
    fcn = {
        "w1": jnp.asarray(fcn_rng.normal(0, 0.4, (6, 6)), jnp.float32),
        "w2": jnp.asarray(fcn_rng.normal(0, 0.4, (6, 2)), jnp.float32),
    }
    traj_j = jnp.asarray(traj)
    labs = jnp.asarray(words)

    step = engine.make_dl_osd_step(model, code.h, code.k)
    out_step, refined_step = step(
        dia_params, traj_j, labs, jnp.asarray(teps), jnp.asarray(mask),
        jnp.asarray(acc, jnp.int32), fcn,
    )

    refined = model.refine_fast(dia_params, traj_j)
    prep = engine.prepare(refined, traj_j[:, 0], labs, jnp.asarray(code.h), code.k)
    out = engine.sliding_osd(prep, jnp.asarray(teps), jnp.asarray(mask), acc, fcn, code.k)

    np.testing.assert_allclose(np.asarray(refined_step), np.asarray(refined), rtol=1e-6)
    for key in ("success", "strict_success", "complexity", "window_num", "deep_limit"):
        np.testing.assert_array_equal(
            np.asarray(out_step[key]), np.asarray(out[key]), err_msg=key
        )


def test_prepare_matches_gather_reference(code):
    """The one-hot-matmul 'gathers' in prepare are bit-exact vs
    take_along_axis (single-term sums under Precision.HIGHEST)."""
    from short_ldpc_decoding_osd_tpu.ops import gf2ops

    updated, original, words = _failure_like_batch(code, 16, 31)
    h = jnp.asarray(code.h)
    prep = engine.prepare(
        jnp.asarray(updated), jnp.asarray(original), jnp.asarray(words), h, code.k
    )
    perm, h_p = gf2ops.reliability_sort(jnp.asarray(updated), h)
    mrb_info = gf2ops.identify_mrb(h_p, code.k)
    full_perm = jnp.take_along_axis(perm, mrb_info["index_order"], axis=1)
    gather = lambda x: jnp.take_along_axis(jnp.asarray(x), full_perm, axis=1)
    np.testing.assert_array_equal(
        np.asarray(prep.order_updated), np.asarray(gather(updated))
    )
    np.testing.assert_array_equal(
        np.asarray(prep.order_original), np.asarray(gather(original))
    )
    np.testing.assert_array_equal(
        np.asarray(prep.order_labels),
        np.asarray(gather(words.astype(np.int8))),
    )


def test_chunked_blocks_match_padded(code):
    """pack_tep_chunks + bounds == stack_padded_blocks, bitwise (minima,
    argmins, and the full sliding_osd outputs)."""
    updated, original, words = _failure_like_batch(code, 6, 23)
    decoding_path = [[0, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
                     [1, 1, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0], [0, 2, 0, 0, 0, 0],
                     [2, 1, 0, 0, 0, 0], [0, 0, 0, 1, 0, 0]]
    blocks, acc = segments.build_tep_blocks(decoding_path, code.k)
    teps_p, mask_p = segments.stack_padded_blocks(blocks)
    teps_c, mask_c, bounds = segments.pack_tep_chunks(blocks, chunk=64)
    assert sum(e - s for s, e in bounds) == int(acc[-1])
    prep = engine.prepare(
        jnp.asarray(updated), jnp.asarray(original), jnp.asarray(words),
        jnp.asarray(code.h), code.k,
    )
    min_p, arg_p = engine.block_discrepancy_minima(
        prep, jnp.asarray(teps_p), jnp.asarray(mask_p), code.k
    )
    min_c, arg_c = engine.block_discrepancy_minima(
        prep, jnp.asarray(teps_c), jnp.asarray(mask_c), code.k, bounds=bounds
    )
    np.testing.assert_array_equal(np.asarray(min_c), np.asarray(min_p))
    np.testing.assert_array_equal(np.asarray(arg_c), np.asarray(arg_p))

    fcn = {
        "w1": jnp.zeros((6, 6), jnp.float32),
        "w2": jnp.zeros((6, 2), jnp.float32),
    }
    out_p = engine.sliding_osd(
        prep, jnp.asarray(teps_p), jnp.asarray(mask_p), acc, fcn, code.k
    )
    out_c = engine.sliding_osd(
        prep, jnp.asarray(teps_c), jnp.asarray(mask_c), acc, fcn, code.k,
        bounds=bounds,
    )
    for key in out_p:
        np.testing.assert_array_equal(
            np.asarray(out_c[key]), np.asarray(out_p[key]), err_msg=key
        )


def test_vectorized_walk_matches_scan_oracle():
    """sliding_walk (one-matmul vectorized) == _sliding_walk_scan (serial
    replay) on random minima and stopper weights, all outputs."""
    rng = np.random.default_rng(11)
    for trial in range(5):
        b, p, w = 64, 30, 5
        minima = jnp.asarray(rng.gamma(2.0, 5.0, (b, p)), jnp.float32)
        fcn = {
            "w1": jnp.asarray(rng.normal(0, 0.5, (w + 1, w + 1)), jnp.float32),
            "w2": jnp.asarray(rng.normal(0, 0.5, (w + 1, 2)), jnp.float32),
        }
        margin = [0.9, 0.5, 0.99][trial % 3]
        got = engine.sliding_walk(minima, fcn, window=w, soft_margin=margin)
        want = engine._sliding_walk_scan(
            minima, fcn, window=w, soft_margin=margin
        )
        for key in want:
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(want[key]),
                err_msg=f"{key} trial {trial}",
            )


def test_dl_osd_step_from_llr_equals_trajectory_step():
    """The r5 production path (raw-LLR fused step, engine.
    make_dl_osd_step_from_llr) must reproduce the trajectory-input step
    bitwise when its in-step re-decode is the same XLA decoder, and its
    on-device CE/BER bookkeeping must match the host helpers."""
    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.mc import run_nms_mc
    from short_ldpc_decoding_osd_tpu.mc.harness import (
        detected_failure_mask,
        iteration_ber_list,
        iteration_ce_list,
        trajectories_for_llrs,
    )
    from short_ldpc_decoding_osd_tpu.models import (
        make_dia,
        stopper_engine_params,
    )
    from short_ldpc_decoding_osd_tpu.ops import nms as nms_ops
    from short_ldpc_decoding_osd_tpu.osd import engine as eng
    from short_ldpc_decoding_osd_tpu.osd import segments

    code = get_code("ccsds_128_64")
    iters = 6
    params = nms_ops.init_params("NMS-1")
    _, fb = run_nms_mc(
        code, params, "NMS-1", iters, 2.0, batch=512, error_budget=10 ** 9,
        max_frames=1024, capture_failures=True, capture_trajectories=False,
    )
    assert fb is not None and not fb.confirmed
    n_f = min(len(fb.trajectories), 48)
    llr = fb.trajectories[:n_f, 0]
    labels = fb.labels[:n_f]
    traj = trajectories_for_llrs(code, params, "NMS-1", iters, llr)

    model = make_dia("model_rnn1", code.n, iters + 1)
    import jax

    dia_params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, iters + 1, code.n)))
    path = [[0, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
            [1, 1, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0], [0, 0, 0, 1, 0, 0],
            [1, 0, 1, 0, 0, 0]]
    blocks, acc = segments.build_tep_blocks(path, code.k, 6)
    teps, mask, bounds = segments.pack_tep_chunks(blocks)
    s_params = {
        "w1": np.asarray(
            np.random.default_rng(1).normal(0, 0.1, (6, 6)), np.float32),
        "w2": np.asarray(
            np.random.default_rng(2).normal(0, 0.1, (6, 2)), np.float32),
    }
    fcn = stopper_engine_params(s_params) if not isinstance(
        s_params, dict) else s_params

    step_traj = eng.make_dl_osd_step(
        model, code.h_osd, code.k, bounds=bounds)
    step_llr = eng.make_dl_osd_step_from_llr(
        model, code, "NMS-1", iters, bounds=bounds, decoder="xla",
        with_iteration_stats=True)
    args_tail = (jnp.asarray(teps), jnp.asarray(mask),
                 jnp.asarray(acc, jnp.int32), fcn)
    out_a, refined_a = step_traj(
        dia_params, jnp.asarray(traj, jnp.float32),
        jnp.asarray(labels, jnp.int32), *args_tail)
    out_b, refined_b, det, (ce_rows, ber_rows) = step_llr(
        params, dia_params, jnp.asarray(llr, jnp.float32),
        jnp.asarray(labels, jnp.int32), *args_tail)

    np.testing.assert_array_equal(np.asarray(out_a["success"]),
                                  np.asarray(out_b["success"]))
    np.testing.assert_array_equal(np.asarray(out_a["complexity"]),
                                  np.asarray(out_b["complexity"]))
    np.testing.assert_array_equal(np.asarray(out_a["window_num"]),
                                  np.asarray(out_b["window_num"]))
    np.testing.assert_allclose(np.asarray(refined_a), np.asarray(refined_b),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(det), detected_failure_mask(code, "NMS-1", traj))
    # on-device CE/BER rows vs the host helpers (f32 vs f64 tolerance)
    ce_host = iteration_ce_list(traj, labels)
    ber_host = iteration_ber_list(traj, labels)
    ce_dev = np.asarray(ce_rows).sum(axis=0)
    ber_dev = np.asarray(ber_rows).sum(axis=0) / (n_f * code.n)
    np.testing.assert_allclose(ce_dev[:-1], ce_host, rtol=1e-4)
    np.testing.assert_allclose(ber_dev[:-1], ber_host, rtol=1e-6, atol=1e-9)
