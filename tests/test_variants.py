"""NMS variant coverage: NMS-2/3/r and ENMS train a few steps and decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.channel import ChannelSpec, sample_batch
from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import nms
from short_ldpc_decoding_osd_tpu.train import NMSTrainConfig, train_nms


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


@pytest.mark.parametrize("variant", ["NMS-2", "NMS-3", "NMS-r"])
def test_variant_trains(code, variant):
    cfg = NMSTrainConfig(
        variant=variant, num_iterations=4, batch=32, num_batches=2,
        termination_step=4, print_interval=2,
    )
    params, summary = train_nms(code, cfg)
    assert np.isfinite(summary["final_loss"])
    if variant == "NMS-r":
        # non-negativity projection held
        assert float(jnp.min(params["nn_w1"])) >= 0.0
        assert float(jnp.min(params["nn_w2"])) >= 0.0


def test_enms_uses_extended_matrix():
    # ENMS on a code whose extension adds rows
    from short_ldpc_decoding_osd_tpu.codes import Code

    h = np.array(
        [
            [1, 1, 1, 1, 0, 0, 0, 0],
            [1, 1, 0, 0, 1, 1, 0, 0],
            [0, 0, 1, 0, 1, 0, 1, 0],
            [0, 1, 0, 1, 0, 1, 0, 1],
        ],
        dtype=np.uint8,
    )
    code = Code.from_parity(h, "tiny8")
    assert code.extended().m > code.m
    cfg = NMSTrainConfig(
        variant="ENMS", num_iterations=3, batch=16, num_batches=2,
        termination_step=3, print_interval=2,
    )
    params, summary = train_nms(code, cfg)
    assert np.isfinite(summary["final_loss"])


def test_rayleigh_channel_decodes(code):
    spec = ChannelSpec.rayleigh_spec(6.0, code.rate, duration=1.0)
    llr, words = sample_batch(
        jax.random.PRNGKey(0), spec, jnp.asarray(code.g, jnp.float32), 64
    )
    params = nms.init_params("NMS-1")
    soft = nms.decode_final(params, jnp.asarray(code.h), llr, 12, "NMS-1")
    st = nms.frame_stats(soft, words, jnp.asarray(code.h))
    # fading gains are nonnegative and finite; decoding runs
    assert np.isfinite(np.asarray(soft)).all()
    assert 0.0 <= float(jnp.mean(st["frame_error"])) <= 1.0


@pytest.mark.parametrize("name", ["regular_256_128", "regular_512_256"])
def test_multi_code_decode(name):
    code = get_code(name)
    spec = ChannelSpec.awgn(3.5, code.rate)
    llr, words = sample_batch(
        jax.random.PRNGKey(1), spec, jnp.asarray(code.g, jnp.float32), 32
    )
    params = nms.init_params("NMS-1")
    soft = nms.decode_final(params, jnp.asarray(code.h), llr, 12, "NMS-1")
    st = nms.frame_stats(soft, words, jnp.asarray(code.h))
    assert float(jnp.mean(st["frame_error"])) < 0.9


def test_rayleigh_sampler_moments_match_reference_formula(code):
    """Statistical check of the block-fading sampler vs the reference's
    construction (Testing_data_gen_128/data_generating.py:21-38):
    h = (N(0,1) + jN(0,1))/sqrt(2) held constant per block, gain = |h| —
    so E[gain] = sqrt(pi)/2 ~= 0.8862, E[gain^2] = 1, and the gain is
    constant within each 16-sample fading block."""
    spec = ChannelSpec.rayleigh_spec(60.0, code.rate, duration=1.0)  # sigma~0
    assert spec.fading_block == 16
    llr, words = sample_batch(
        jax.random.PRNGKey(3), spec, jnp.asarray(code.g, jnp.float32), 4096,
        all_zeros=True,  # bit 0 everywhere -> received == +gain + tiny noise
    )
    g = np.asarray(llr).reshape(-1)
    n_blocks = len(g) // 16
    blocks = g[: n_blocks * 16].reshape(n_blocks, 16)
    # block constancy (noise at 60 dB is ~1e-3 of the gain)
    assert np.max(np.std(blocks, axis=1)) < 1e-2
    gains = blocks.mean(axis=1)
    # moments: E[|h|] = sqrt(pi)/2, E[|h|^2] = 1, with ~1/sqrt(n) tolerance
    se1 = np.sqrt((1 - np.pi / 4) / n_blocks)  # var(|h|) = 1 - pi/4
    assert abs(gains.mean() - np.sqrt(np.pi) / 2) < 5 * se1
    assert abs((gains ** 2).mean() - 1.0) < 5 * np.sqrt(1.0 / n_blocks)
