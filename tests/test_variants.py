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
