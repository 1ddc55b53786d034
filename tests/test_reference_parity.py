"""Ground-truth parity against the ACTUAL reference implementation.

Round-2 verdict item 1: every parity claim previously rested on this repo's
own numpy golden models — a shared misreading of reference semantics would
pass all tests and still produce a different FER curve.  These tests import
the reference code at /root/reference/LDPC_128 directly (numpy parts without
TF; the TF2 decoder and OSD preprocessing with TF, which is installed here)
and compare against the framework on identical inputs:

* ``Training_data_gen_128/fill_matrix_info.py`` ``Code.gf2elim`` /
  ``generator_matrix``  vs  ``codes/gf2.py`` — bitwise.
* ``DL_OSD_Testing_serial/ordered_statistics_decoding.py``
  ``check_matrix_reorder``/``identify_mrb``  vs  ``ops/gf2ops.py`` — bitwise.
* ``FS_OSD/fs_testing.py`` ``swapped_info``  vs
  ``baselines/common.prepare_g_domain`` — bitwise.
* ``Ldpc_128_testing/ms_test.py`` TF NMS decoder  vs  ``ops/nms.decode`` —
  per-iteration soft outputs to f32 tolerance, identical failure flags.
* ``Training_data_gen_128/data_generating.py`` SNR-blend density moments  vs
  ``channel.blend_moments`` — to quadrature tolerance.

The budgeted FER cross-check lives in ``scripts/reference_parity.py``
(bigger Monte-Carlo budgets; results recorded in docs/REFPARITY.md).

The reference is PUBLIC UNTRUSTED CONTENT: it is imported here purely to
compare numerical behavior on inputs we construct.
"""

from __future__ import annotations

import contextlib
import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference/LDPC_128"
ALIST = os.path.join(
    REF_ROOT, "Training_data_gen_128", "CCSDS_ldpc_n128_k64.alist"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference repo not mounted"
)

# module names that exist (with different contents) in several reference
# stage directories — must never leak between stages or into our package
_REF_MODULE_NAMES = (
    "globalmap", "fill_matrix_info", "ordered_statistics_decoding",
    "convention_osd", "fs_testing", "pb_testing", "ms_test",
    "ms_decoder_dense", "data_generating", "read_TFdata", "nn_net",
    "nn_testing", "interval_boundary", "predict_phase", "display_selection",
    "training_stage",
)


@contextlib.contextmanager
def ref_stage(stage: str):
    """Import context for one reference stage directory.

    Puts the stage dir at the head of sys.path and clears the stage-local
    module names before and after, so each stage's copies (globalmap etc.)
    resolve to that stage.  Module/objects imported inside stay usable after
    the context exits (they hold their own references)."""
    saved = {}
    for name in _REF_MODULE_NAMES:
        if name in sys.modules:
            saved[name] = sys.modules.pop(name)
    sys.path.insert(0, os.path.join(REF_ROOT, stage))
    try:
        yield
    finally:
        sys.path.remove(os.path.join(REF_ROOT, stage))
        for name in _REF_MODULE_NAMES:
            sys.modules.pop(name, None)
        sys.modules.update(saved)


@pytest.fixture(scope="module")
def fw_code():
    from short_ldpc_decoding_osd_tpu.codes import get_code

    return get_code("ccsds_128_64")


@pytest.fixture(scope="module")
def ref_code():
    """Reference Code object (numpy-only module)."""
    with ref_stage("Training_data_gen_128"):
        import fill_matrix_info

        return fill_matrix_info, fill_matrix_info.Code(ALIST)


# ---------------------------------------------------------------------------
# L0: GF(2) elimination + generator construction (numpy vs numpy, bitwise)
# ---------------------------------------------------------------------------


def test_gf2elim_matches_reference(ref_code, fw_code):
    """codes/gf2.row_reduce vs the reference Code.gf2elim: identical reduced
    matrix AND identical column-swap record on permuted H and on random
    (incl. rank-deficient) matrices."""
    from short_ldpc_decoding_osd_tpu.codes import gf2

    mod, rc = ref_code
    rng = np.random.default_rng(0)
    cases = []
    for _ in range(10):
        cases.append(rc.H[:, rng.permutation(rc.H.shape[1])].astype(int))
    for _ in range(10):
        m = rng.integers(0, 2, (24, 40))
        cases.append(m.astype(int))
    # rank-deficient: duplicate + summed rows trigger the row-deletion path
    for _ in range(5):
        m = rng.integers(0, 2, (16, 24))
        m[7] = m[3]
        m[12] = (m[1] + m[2]) % 2
        cases.append(m.astype(int))
    for mat in cases:
        ref_red, ref_swaps = rc.gf2elim(mat.copy())
        fw_red, fw_swaps = gf2.row_reduce(mat.copy())
        np.testing.assert_array_equal(np.asarray(ref_red) % 2, fw_red)
        assert [tuple(s) for s in ref_swaps] == list(fw_swaps)


def test_generator_matrix_matches_reference(ref_code, fw_code):
    """Framework G is bit-identical to the reference's systematic generator
    (same swap-undo bookkeeping), and H parses identically from the alist."""
    _, rc = ref_code
    np.testing.assert_array_equal(rc.H, fw_code.h)
    np.testing.assert_array_equal(rc.G % 2, fw_code.g)
    assert rc.k == fw_code.k


# ---------------------------------------------------------------------------
# Channel: SNR-blend importance density moments
# ---------------------------------------------------------------------------


def test_blend_moments_match_reference_quadrature(fw_code):
    """channel.blend_moments vs the reference's f_w/f1/f2 quadrature
    (Training_data_gen_128/data_generating.py:15-24,56-70)."""
    from scipy import integrate

    from short_ldpc_decoding_osd_tpu.channel import blend_moments, sigma_for_snr

    with ref_stage("Training_data_gen_128"):
        import data_generating as ref_dg

    rate = fw_code.rate
    for lo, hi in ((2.0, 3.5), (2.5, 2.9)):
        s1, s2 = sigma_for_snr(lo, rate), sigma_for_snr(hi, rate)
        mid = sigma_for_snr((lo + hi) / 2.0, rate)
        norm, _ = integrate.quad(ref_dg.f_w, s1, s2, args=(mid,))
        ref_mean = integrate.quad(ref_dg.f1, s1, s2, args=(mid,))[0] / norm
        ref_second = integrate.quad(ref_dg.f2, s1, s2, args=(mid,))[0] / norm
        ref_sigma = np.sqrt(ref_second - ref_mean**2)
        mean, sigma = blend_moments(lo, hi, rate)
        assert abs(mean - ref_mean) < 1e-9
        assert abs(sigma - ref_sigma) < 1e-9
    # degenerate endpoints: fixed sigma, mean 1 (the default recipe point)
    mean, sigma = blend_moments(2.7, 2.7, rate)
    assert mean == 1.0 and abs(sigma - sigma_for_snr(2.7, rate)) < 1e-12


# ---------------------------------------------------------------------------
# Stage 6: H-domain OSD preprocessing (TF reference vs JAX, bitwise)
# ---------------------------------------------------------------------------


def test_identify_mrb_matches_reference_stage6(ref_code, fw_code):
    """ops/gf2ops.reliability_sort + identify_mrb vs the reference osd's
    check_matrix_reorder + identify_mrb (DL_OSD_Testing_serial/
    ordered_statistics_decoding.py:30-80): same index order, same M matrix,
    same swap counts, same LRB swap indicators."""
    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.ops import gf2ops

    _, rc = ref_code
    threshold_sum = 3
    with ref_stage("DL_OSD_Testing_serial"):
        import globalmap as GL
        import ordered_statistics_decoding as ref_osd_mod

        GL.set_map("code_parameters", rc)
        GL.set_map("threshold_sum", threshold_sum)
        GL.set_map("num_iterations", 12)
        ref_osd = ref_osd_mod.osd(rc)

        rng = np.random.default_rng(1)
        batch = 8
        n, k = rc.check_matrix_column, rc.k
        inputs = rng.normal(1.0, 0.9, (batch, n)).astype(np.float32)
        labels = np.zeros((batch, n), np.int64)
        iteration_inputs = np.tile(inputs, (13, 1)).astype(np.float32)

        import tensorflow as tf

        order_H, order_inputs, _, _ = ref_osd.check_matrix_reorder(
            tf.constant(iteration_inputs), tf.constant(inputs),
            tf.constant(labels),
        )
        idx_list, m_list, swap_lens, lrb_swaps = ref_osd.identify_mrb(
            np.asarray(order_H)
        )

    perm, h_p = gf2ops.reliability_sort(jnp.asarray(inputs), jnp.asarray(rc.H))
    res = gf2ops.identify_mrb(h_p, k)
    jump_point = (n - k) - 4 * threshold_sum
    fw_lrb_swap = gf2ops.lrb_swap_indicator(res["lrb_ranks"], jump_point)
    for b in range(batch):
        np.testing.assert_array_equal(
            np.asarray(idx_list[b]), np.asarray(res["index_order"][b])
        )
        np.testing.assert_array_equal(
            np.asarray(m_list[b]) % 2, np.asarray(res["m_matrix"][b])
        )
        assert int(swap_lens[b]) == int(res["swap_len"][b])
        np.testing.assert_array_equal(
            np.asarray(lrb_swaps[b]), np.asarray(fw_lrb_swap[b])
        )
        # the reference's reliability permutation then framework index_order
        # compose identically: positions map to the same original bits
        ref_perm = np.asarray(
            tf.argsort(np.abs(inputs[b]), direction="ASCENDING")
        )
        np.testing.assert_array_equal(ref_perm, np.asarray(perm[b]))


# ---------------------------------------------------------------------------
# Stage 7: G-domain OSD preprocessing (TF reference vs JAX, bitwise)
# ---------------------------------------------------------------------------


def test_swapped_info_matches_reference_fs(ref_code, fw_code):
    """baselines/common.prepare_g_domain vs FS_OSD fs_testing.swapped_info
    (fs_testing.py:233-322): same permuted inputs/labels and same systematic
    [I | P] generator, frame by frame."""
    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.baselines.common import prepare_g_domain

    _, rc = ref_code
    rng = np.random.default_rng(2)
    batch = 8
    n, k = rc.check_matrix_column, rc.k
    msgs = rng.integers(0, 2, (batch, k))
    words = msgs @ (rc.G % 2) % 2
    noise = rng.normal(1.0, 0.8, (batch, n))
    inputs = np.where(words == 0, noise, -noise).astype(np.float32)

    prep = prepare_g_domain(
        jnp.asarray(inputs), jnp.asarray(words), jnp.asarray(rc.G % 2), k
    )

    with ref_stage("FS_OSD"):
        import fill_matrix_info as fs_fill
        import globalmap as GL

        fs_code = fs_fill.Code(
            os.path.join(REF_ROOT, "FS_OSD", "CCSDS_ldpc_n128_k64.alist")
        )
        GL.set_map("code_parameters", fs_code)
        import tensorflow as tf

        import fs_testing

        for b in range(batch):
            upd_in, upd_lab, red_g = fs_testing.swapped_info(
                tf.constant(inputs[b]), tf.constant(words[b].astype(np.int64))
            )
            np.testing.assert_allclose(
                np.asarray(upd_in), np.asarray(prep["inputs"][b]), rtol=0,
                atol=0,
            )
            np.testing.assert_array_equal(
                np.asarray(upd_lab), np.asarray(prep["labels"][b])
            )
            ref_p = np.asarray(red_g)[:, k:] % 2
            np.testing.assert_array_equal(
                ref_p, np.asarray(prep["p_matrix"][b])
            )


# ---------------------------------------------------------------------------
# Stage 5: the TF NMS decoder itself (reference TF2 vs JAX)
# ---------------------------------------------------------------------------


def _run_ref_nms(rc, llr, labels, raw_check_weight, num_iterations=12):
    with ref_stage("Ldpc_128_testing"):
        import globalmap as GL

        GL.set_map("selected_decoder_type", "NMS-1")
        GL.set_map("num_iterations", num_iterations)
        GL.set_map("code_parameters", rc)
        import tensorflow as tf

        import ms_test

        layer = ms_test.Decoder_Layer()
        t_llr = tf.constant(llr, tf.float32)
        t_lab = tf.constant(labels, tf.int64)
        _ = layer(t_llr, t_lab)  # build (weights at init -0.048)
        layer.shared_check_weight.assign([raw_check_weight])
        outs = layer(t_llr, t_lab)
        return np.stack([np.asarray(o) for o in outs])  # (T+1, B, n)


@pytest.mark.parametrize("raw_w", [-0.048, 0.16855433583259583])
def test_nms_decoder_matches_reference_tf(ref_code, fw_code, raw_w):
    """ops/nms.decode vs the reference's eager-TF2 Decoder_Layer
    (Ldpc_128_testing/ms_test.py:72-242) on identical inputs with the same
    (init / round-2 trained) normalization weight: every iteration's soft
    output agrees to f32 tolerance and the detected-failure flags agree
    exactly."""
    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.ops import nms

    _, rc = ref_code
    rng = np.random.default_rng(3)
    batch, n, k = 64, rc.check_matrix_column, rc.k
    msgs = rng.integers(0, 2, (batch, k))
    words = msgs @ (rc.G % 2) % 2
    sigma = 0.84  # ~2.5 dB operating point: plenty of failures in-batch
    noise = rng.normal(1.0, sigma, (batch, n))
    llr = np.where(words == 0, noise, -noise).astype(np.float32)

    ref_outs = _run_ref_nms(rc, llr, words, raw_w)

    params = {"check": jnp.asarray([raw_w], jnp.float32)}
    fw_outs = np.asarray(
        nms.decode(params, jnp.asarray(rc.H, jnp.float32), jnp.asarray(llr),
                   12, "NMS-1")
    )
    assert ref_outs.shape == fw_outs.shape == (13, batch, n)
    np.testing.assert_allclose(ref_outs, fw_outs, rtol=2e-4, atol=2e-4)

    # identical hard decisions and detected-failure flags on the last
    # iteration (the quantities stage 5 actually consumes)
    ref_hard = (ref_outs[-1] <= 0).astype(np.int64)
    fw_hard = (fw_outs[-1] <= 0).astype(np.int64)
    np.testing.assert_array_equal(ref_hard, fw_hard)
    ref_synd = (ref_hard @ rc.H.T) % 2
    st = nms.frame_stats(
        jnp.asarray(fw_outs[-1]), jnp.asarray(words),
        jnp.asarray(rc.H, jnp.float32),
    )
    np.testing.assert_array_equal(
        ref_synd.any(axis=1), np.asarray(st["detected_failure"]).astype(bool)
    )
    assert ref_synd.any(axis=1).sum() > 0  # the case actually has failures


# ---------------------------------------------------------------------------
# Stage 6: the production sliding WALK vs the reference's serial sliding_osd
# (per-frame, deterministic — the full-scale TPU instance of this check is
# scripts/reference_parity.py --mode fw-walk/ref-walk, docs/REFPARITY.md §6)
# ---------------------------------------------------------------------------


def test_sliding_walk_matches_reference_sliding_osd(ref_code, fw_code):
    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.osd import engine, segments

    _, rc = ref_code
    code = fw_code
    rng = np.random.default_rng(11)
    batch, t1 = 24, 13
    n, k = code.n, code.k
    msgs = rng.integers(0, 2, (batch, k))
    words = (msgs @ code.g % 2).astype(np.int64)
    noise = rng.normal(1.0, 0.9, (batch, t1, n))
    traj = np.where(words[:, None, :] == 0, noise, -noise).astype(np.float32)
    # stand-in refined metric (walk parity needs identical inputs, not a DIA)
    refined = (traj[:, -1] * rng.uniform(0.8, 1.2, (batch, n))).astype(
        np.float32
    )
    # stopper weights scaled so a mix of frames stops early / walks through
    w1 = rng.normal(0, 0.6, (6, 6)).astype(np.float32)
    w2 = rng.normal(0, 0.6, (6, 2)).astype(np.float32)
    window, soft_margin, threshold_sum = 5, 0.7, 3
    path = [[0] * 6, [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
            [0, 0, 1, 0, 0, 0], [1, 1, 0, 0, 0, 0], [0, 0, 0, 1, 0, 0],
            [2, 0, 0, 0, 0, 0], [0, 0, 0, 0, 1, 0], [1, 0, 1, 0, 0, 0],
            [0, 0, 0, 0, 0, 1]]

    blocks, acc = segments.build_tep_blocks(path, k, 6)
    teps, mask, bounds = segments.pack_tep_chunks(blocks)
    fcn = {"w1": jnp.asarray(w1), "w2": jnp.asarray(w2)}
    prep = engine.prepare(
        jnp.asarray(refined), jnp.asarray(traj[:, 0]),
        jnp.asarray(words, jnp.int32), jnp.asarray(code.h_osd), k,
    )
    out = engine.sliding_osd(
        prep, jnp.asarray(teps), jnp.asarray(mask),
        jnp.asarray(acc, jnp.int32), fcn, k,
        window=window, soft_margin=soft_margin, bounds=bounds,
    )
    fw_success = np.asarray(out["success"])
    fw_windows = np.asarray(out["window_num"])
    fw_complexity = np.asarray(out["complexity"])

    with ref_stage("DL_OSD_Testing_serial"):
        import globalmap as GL

        GL.set_map("code_parameters", rc)
        GL.set_map("num_iterations", t1 - 1)
        GL.set_map("threshold_sum", threshold_sum)
        GL.set_map("sliding_win_width", window)
        GL.set_map("soft_margin", soft_margin)
        import ordered_statistics_decoding as ref_osd_mod
        import tensorflow as tf

        ref_osd = ref_osd_mod.osd(rc)
        tw1, tw2 = tf.constant(w1), tf.constant(w2)

        def fcn_tf(x):
            return tf.nn.softmax(
                tf.matmul(tf.matmul(tf.cast(x, tf.float32), tw1), tw2)
            )

        teps_list = [b.astype(np.int64) for b in blocks]
        for i in range(batch):
            s, f, w, c = ref_osd.sliding_osd(
                fcn_tf,
                tf.constant(traj[i]),
                tf.constant(refined[i : i + 1]),
                tf.constant(words[i : i + 1]),
                (teps_list, acc),
            )
            assert bool(fw_success[i]) == (int(s) == 1), f"frame {i} S/F"
            assert int(fw_windows[i]) == int(w), f"frame {i} window count"
            assert int(fw_complexity[i]) == int(c), f"frame {i} TEP count"


def _load_refparity_script():
    import importlib.util

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "reference_parity.py",
    )
    spec = importlib.util.spec_from_file_location("refparity_script", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _baseline_frames(fw_code, batch, snr_db, seed):
    rng = np.random.default_rng(seed)
    words = fw_code.encode(rng.integers(0, 2, (batch, fw_code.k)))
    sigma = np.sqrt(1.0 / (2 * fw_code.rate * 10 ** (snr_db / 10)))
    rx = 1.0 + sigma * rng.standard_normal((batch, fw_code.n))
    llr = np.where(words == 0, rx, -rx).astype(np.float32)
    return llr, words.astype(np.int64)


def test_fs_search_per_frame_parity(fw_code):
    """CPU-sized instance of docs/REFPARITY.md §7: the framework's batched
    FS-OSD vs the reference's own search loop (fs_testing.py:129-176,
    driven through its one_tep_compare/acquire_pnc_boundary/swapped_info)
    on identical frames — per-frame S/F (both scorings), TEP count and
    stop kind must agree exactly."""
    import types

    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.baselines import fs_osd

    rp = _load_refparity_script()
    llr, labels = _baseline_frames(fw_code, 8, 3.0, 21)
    args = types.SimpleNamespace(entry_frames=0, pb_pop_cap=512, osd_snr=3.0)
    ref_rows = rp._ref_fs_instrumented(llr, labels, args)
    kw = dict(order_limit=3, beta=0.1, d_min=14, tau_psc=30)
    out_i = fs_osd.fs_osd(jnp.asarray(llr), jnp.asarray(labels),
                          fw_code.g, fw_code.k, **kw)
    out_l = fs_osd.fs_osd(jnp.asarray(llr), jnp.asarray(labels),
                          fw_code.g, fw_code.k,
                          score_tau_e_codeword=False, **kw)
    stop_names = np.asarray(["zero", "tau_e", "gate", "exhaust"])
    fw_stop = stop_names[
        np.where(np.asarray(out_i["zero_stop"]), 0,
                 np.where(np.asarray(out_i["tau_e_stop"]), 1,
                          np.where(np.asarray(out_i["gate_stop"]), 2, 3)))
    ]
    for i in range(len(llr)):
        assert bool(out_i["success"][i]) == ref_rows["success_intended"][i], i
        assert bool(out_l["success"][i]) == ref_rows["success_literal"][i], i
        assert int(out_i["num_teps"][i]) == ref_rows["num_teps"][i], i
        assert fw_stop[i] == ref_rows["stop"][i], i


def test_pb_search_per_frame_parity(fw_code):
    """CPU-sized §7 instance for PB-OSD: framework's static-sorted batched
    search vs the reference's dynamic priority-list loop
    (pb_testing.py:100-161).  Success and stop kind must agree per frame;
    cost/maintained-list may differ only on documented p_e_pro float-tie
    frames (none at this seed)."""
    import types

    import jax.numpy as jnp

    from short_ldpc_decoding_osd_tpu.baselines import pb_osd

    rp = _load_refparity_script()
    llr, labels = _baseline_frames(fw_code, 8, 3.0, 22)
    args = types.SimpleNamespace(entry_frames=0, pb_pop_cap=512, osd_snr=3.0)
    ref_rows = rp._ref_pb_instrumented(llr, labels, 3.0, args, fw_cost=None)
    out = pb_osd.pb_osd(jnp.asarray(llr), jnp.asarray(labels),
                        fw_code.g, fw_code.k, snr_db=3.0, order_limit=3)
    stop_names = np.asarray(["exhaust", "suc", "pro"])
    fw_stop = stop_names[
        np.where(np.asarray(out["stopped_by_suc"]), 1,
                 np.where(np.asarray(out["stopped_by_pro"]), 2, 0))
    ]
    tie_frames = 0
    for i in range(len(llr)):
        if ref_rows["capped"][i]:
            continue
        assert bool(out["success"][i]) == ref_rows["success"][i], i
        assert fw_stop[i] == ref_rows["stop"][i], i
        if int(out["num_teps"][i]) != ref_rows["cost"][i]:
            tie_frames += 1
        else:
            assert int(out["maintained_list"][i]) == ref_rows["maintained"][i], i
            assert int(out["suc_evals"][i]) == ref_rows["suc1"][i], i
    assert tie_frames <= 1  # documented float-tie allowance (§7: 4/254)
