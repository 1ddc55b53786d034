"""Edge-layout pure-XLA NMS rung (ops/nms_edge_xla) vs the bit-exact dense
decoder, including the padded-irregular layout and the harness/engine
wiring that selects it for codes above the VMEM kernels' envelope."""

import numpy as np
import pytest

import jax.numpy as jnp

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import nms
from short_ldpc_decoding_osd_tpu.ops.nms_edge_xla import (
    decode_edge_xla,
    decode_final_edge_xla,
    edge_layout,
    incidence_matrices,
)


@pytest.mark.parametrize("name", ["ccsds_128_64", "wimax_1056_880"])
@pytest.mark.parametrize("variant", ["NMS-1", "NMS-2", "NMS-3"])
def test_matches_dense_decoder(name, variant):
    """Trajectory and final-only outputs match the dense decoder to f32
    addition-reorder tolerance with identical hard decisions, on a regular
    (CCSDS) and an irregular production-scale (WiMAX) code."""
    code = get_code(name)
    rng = np.random.default_rng(0)
    llr = jnp.asarray(rng.normal(1.0, 0.8, (32, code.n)), jnp.float32)
    h = jnp.asarray(code.h, jnp.float32)
    p = nms.init_params(variant)
    ref = np.asarray(nms.decode(p, h, llr, 6, variant))
    got = np.asarray(decode_edge_xla(p, np.asarray(code.h), llr, 6, variant))
    assert np.abs(ref - got).max() < 1e-4
    assert np.array_equal(np.sign(ref[-1]), np.sign(got[-1]))
    reff = np.asarray(nms.decode_final(p, h, llr, 6, variant))
    gotf = np.asarray(
        decode_final_edge_xla(p, np.asarray(code.h), llr, 6, variant)
    )
    assert np.abs(reff - gotf).max() < 1e-4


def test_irregular_padding_inert():
    """A hand-built irregular H (check degrees 2/3/4): padding slots must
    not perturb the tournament, the sign parity, or the incidence sums."""
    h = np.array(
        [
            [1, 1, 0, 0, 0, 0],
            [0, 1, 1, 1, 0, 0],
            [1, 0, 1, 0, 1, 1],
        ],
        np.int8,
    )
    cols, real = edge_layout(h)
    assert cols.shape == (3, 4)
    assert real.sum() == h.sum()
    gath, scat, _, _ = incidence_matrices(h)
    # every real edge appears exactly once; padding columns are all-zero
    assert gath.sum() == h.sum()
    assert np.array_equal(gath.sum(axis=1), np.asarray(h).sum(axis=0))

    rng = np.random.default_rng(1)
    llr = jnp.asarray(rng.normal(0.5, 1.0, (16, 6)), jnp.float32)
    p = nms.init_params("NMS-1")
    ref = np.asarray(nms.decode(p, jnp.asarray(h, jnp.float32), llr, 5))
    got = np.asarray(decode_edge_xla(p, h, llr, 5))
    assert np.abs(ref - got).max() < 1e-5


def test_nms_r_matches_dense_on_regular_code():
    """NMS-r's leave-one-out neural check update on the edge layout matches
    the dense path to relative f32 tolerance (untrained weights explode the
    magnitudes, amplifying reorder noise absolutely but not relatively) with
    identical hard decisions."""
    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(2)
    llr = jnp.asarray(rng.normal(1.0, 0.8, (16, code.n)), jnp.float32)
    h = jnp.asarray(code.h, jnp.float32)
    p = nms.init_params("NMS-r", code.h)
    ec = jnp.asarray(nms.edge_columns(code.h))
    ref = np.asarray(nms.decode(p, h, llr, 6, "NMS-r", ec))
    got = np.asarray(decode_edge_xla(p, np.asarray(code.h), llr, 6, "NMS-r"))
    rel = np.abs(ref - got).max() / max(np.abs(ref).max(), 1.0)
    assert rel < 1e-3
    assert np.array_equal(np.sign(ref[-1]), np.sign(got[-1]))


def test_nms_r_irregular_raises():
    """NMS-r requires a regular check degree (as the dense path's
    edge_columns); irregular H must raise, and supports() must say so."""
    from short_ldpc_decoding_osd_tpu.ops.nms_edge_xla import supports

    h = np.array([[1, 1, 0, 0], [1, 1, 1, 0], [0, 1, 1, 1]], np.int8)
    assert not supports(h, "NMS-r")
    assert supports(h, "NMS-1")
    p = nms.init_params("NMS-r", get_code("ccsds_128_64").h)
    llr = jnp.zeros((4, 4), jnp.float32)
    with pytest.raises(ValueError):
        decode_final_edge_xla(p, h, llr, 3, "NMS-r")


def test_harness_rung_counters_match_dense():
    """The MC step with the edge-XLA rung forced on produces the same
    counters as the bit-exact dense step on the same seed (deterministic;
    a borderline-frame drift would show up as a counter delta)."""
    import jax

    from short_ldpc_decoding_osd_tpu.channel import ChannelSpec
    from short_ldpc_decoding_osd_tpu.mc.harness import build_nms_mc_step

    code = get_code("ccsds_128_64")
    spec = ChannelSpec.awgn(3.0, code.rate)
    p = nms.init_params("NMS-1")
    key = jax.random.PRNGKey(3)
    s_fast = build_nms_mc_step(
        code, "NMS-1", 8, spec, 512, use_pallas=False, use_edge_xla=True
    )
    s_ref = build_nms_mc_step(
        code, "NMS-1", 8, spec, 512, use_pallas=False, use_edge_xla=False
    )
    c_fast = np.asarray(s_fast(p, key)[0])
    c_ref = np.asarray(s_ref(p, key)[0])
    assert np.array_equal(c_fast, c_ref), (c_fast, c_ref)


def test_engine_decoder_edge_xla_matches_xla():
    """make_dl_osd_step_from_llr with decoder='edge_xla' reaches the same
    OSD success decisions and TEP counts as decoder='xla' (the parity
    anchor) on identical failure rows."""
    import jax

    from short_ldpc_decoding_osd_tpu.models import make_dia
    from short_ldpc_decoding_osd_tpu.osd import engine, segments

    code = get_code("ccsds_128_64")
    iters = 6
    model = make_dia("model_rnn1", code.n, iters + 1)
    rng = np.random.default_rng(5)
    dia_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, iters + 1, code.n))
    )
    path = [[0] * 6, [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
            [1, 1, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0]]
    blocks, acc = segments.build_tep_blocks(path, code.k, 6)
    teps, mask, bounds = segments.pack_tep_chunks(blocks)
    fcn = {
        "w1": np.asarray(rng.normal(0, 0.1, (6, 6)), np.float32),
        "w2": np.asarray(rng.normal(0, 0.1, (6, 2)), np.float32),
    }
    nms_params = nms.init_params("NMS-1")

    llr = jnp.asarray(rng.normal(0.4, 1.0, (32, code.n)), jnp.float32)
    labels = jnp.zeros((32, code.n), jnp.int32)

    outs = {}
    for dec in ("xla", "edge_xla"):
        step = engine.make_dl_osd_step_from_llr(
            model, code, "NMS-1", iters, bounds=bounds, decoder=dec
        )
        out, _, det = step(
            nms_params, dia_params, llr, labels,
            jnp.asarray(teps), jnp.asarray(mask),
            jnp.asarray(acc, jnp.int32), fcn,
        )
        outs[dec] = (
            np.asarray(out["success"]),
            np.asarray(out["complexity"]),
            np.asarray(out["windows_evaluated"]),
            np.asarray(det),
        )
    for a, b in zip(outs["xla"], outs["edge_xla"]):
        assert np.array_equal(a, b)


def test_gradients_match_dense():
    """The training loss gradient through the edge-XLA decoder equals the
    dense decoder's to f32 reorder tolerance (linear incidence matmuls +
    identical argmin tie sets), on regular and irregular codes."""
    import jax

    code = get_code("wimax_1056_880")
    rng = np.random.default_rng(9)
    llr = jnp.asarray(rng.normal(0.8, 1.0, (8, code.n)), jnp.float32)
    words = jnp.zeros((8, code.n), jnp.int32)
    h = jnp.asarray(code.h, jnp.float32)
    h_np = np.asarray(code.h)
    p = nms.init_params("NMS-3")

    def loss_dense(p):
        outs = nms.decode(p, h, llr, 5, "NMS-3")
        return nms.multi_iteration_loss(outs, words)

    def loss_edge(p):
        outs = decode_edge_xla(p, h_np, llr, 5, "NMS-3")
        return nms.multi_iteration_loss(outs, words)

    g_d = jax.grad(loss_dense)(p)
    g_e = jax.grad(loss_edge)(p)
    for k in g_d:
        np.testing.assert_allclose(
            np.asarray(g_d[k]), np.asarray(g_e[k]), rtol=1e-4, atol=1e-4
        )
