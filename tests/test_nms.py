import jax
import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.channel import ChannelSpec, sample_batch
from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import nms

from golden import nms_decode_golden, softplus


@pytest.fixture(scope="module")
def code():
    return get_code("ccsds_128_64")


def _random_llr(code, batch, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(1.0, 0.8, size=(batch, code.n)).astype(np.float32)


def test_nms1_matches_golden(code):
    llr = _random_llr(code, 3, 0)
    params = nms.init_params("NMS-1")
    w_chk = softplus(float(params["check"][0]))
    got = nms.decode(params, jnp.asarray(code.h), jnp.asarray(llr), 5, "NMS-1")
    want = nms_decode_golden(code.h, llr, 5, w_chk=w_chk)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_nms3_matches_golden(code):
    llr = _random_llr(code, 2, 1)
    params = nms.init_params("NMS-3")
    params["bit1"] = jnp.array([0.3], jnp.float32)
    params["bit2"] = jnp.array([-0.5], jnp.float32)
    got = nms.decode(params, jnp.asarray(code.h), jnp.asarray(llr), 4, "NMS-3")
    want = nms_decode_golden(
        code.h,
        llr,
        4,
        w_vc=softplus(0.3),
        w_chk=softplus(float(params["check"][0])),
        w_marg=softplus(-0.5),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_decode_highsnr_converges(code):
    key = jax.random.PRNGKey(0)
    spec = ChannelSpec.awgn(5.0, code.rate)
    llr, words = sample_batch(key, spec, jnp.asarray(code.g, jnp.float32), 256)
    params = nms.init_params("NMS-1")
    outs = nms.decode(params, jnp.asarray(code.h), llr, 12, "NMS-1")
    stats = nms.frame_stats(outs[-1], words, jnp.asarray(code.h))
    fer = float(jnp.mean(stats["frame_error"]))
    assert fer < 0.02  # at 5 dB virtually everything decodes


def test_frame_stats_detects_undetected_error(code):
    # a valid codeword different from the label is an undetected error
    words = jnp.zeros((1, code.n))
    other = jnp.asarray(code.encode(np.eye(code.k, dtype=int)[:1]), jnp.float32)
    soft = 1.0 - 2.0 * other  # negative where bit=1
    stats = nms.frame_stats(soft, words, jnp.asarray(code.h))
    assert bool(stats["frame_error"][0])
    assert bool(stats["undetected_error"][0])
    assert not bool(stats["detected_failure"][0])


def test_loss_decreases_with_correct_sign(code):
    labels = jnp.zeros((4, code.n))
    good = jnp.ones((3, 4, code.n)) * 4.0  # confident zeros
    bad = -good
    assert float(nms.multi_iteration_loss(good, labels)) < float(
        nms.multi_iteration_loss(bad, labels)
    )


def test_nms_r_runs(code):
    llr = _random_llr(code, 2, 3)
    params = nms.init_params("NMS-r", code.h)
    ec = jnp.asarray(nms.edge_columns(code.h))
    outs = nms.decode(
        params, jnp.asarray(code.h), jnp.asarray(llr), 3, "NMS-r", edge_cols=ec
    )
    assert outs.shape == (4, 2, code.n)
    assert np.isfinite(np.asarray(outs)).all()


def test_channel_blend_degenerates():
    from short_ldpc_decoding_osd_tpu.channel import blend_moments, sigma_for_snr

    mean, sigma = blend_moments(2.7, 2.7, 0.5)
    assert mean == 1.0
    assert sigma == pytest.approx(sigma_for_snr(2.7, 0.5))
    # blended moments live in the LLR domain: mean is a weighted average of
    # 2/sigma^2 over sigma in [sigma(3.0), sigma(2.0)]
    mean2, sigma2 = blend_moments(2.0, 3.0, 0.5)
    s_lo = sigma_for_snr(3.0, 0.5)
    s_hi = sigma_for_snr(2.0, 0.5)
    assert 2.0 / s_hi**2 <= mean2 <= 2.0 / s_lo**2
    assert sigma2 > 0.0
