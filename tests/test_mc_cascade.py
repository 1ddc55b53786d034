"""Early-termination MC cascade: hash-RNG golden + counter parity (CPU
interpret mode; throughput + statistical FER parity vs the stateful-PRNG
kernel are validated on hardware by scripts/cascade_fer_check.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import mc_cascade, nms

_MASK = np.uint64(0xFFFFFFFF)


def _mix_np(x):
    """numpy golden of mc_cascade._mix (uint64 carrier, 32-bit wrap)."""
    x = x.astype(np.uint64) & _MASK
    x ^= x >> np.uint64(16)
    x = (x * np.uint64(0x85EBCA6B)) & _MASK
    x ^= x >> np.uint64(13)
    x = (x * np.uint64(0xC2B2AE35)) & _MASK
    x ^= x >> np.uint64(16)
    return x & _MASK


def _sample_np(fids, seed, code, sigma, mean=1.0):
    """numpy golden of mc_cascade._sample (exact integer path; f64 waveform)."""
    n, k = code.n, code.k
    gold1 = np.uint64(np.uint32(mc_cascade._GOLD1))
    gold2 = np.uint64(np.uint32(mc_cascade._GOLD2))
    base = _mix_np((fids.astype(np.uint64) * gold1 + np.uint64(seed)) & _MASK)
    streams = np.arange(1, k + 1, dtype=np.uint64)
    words = _mix_np(base[:, None] ^ ((streams[None, :] * gold2) & _MASK))
    msg = (words & np.uint64(1)).astype(np.int64)
    codeword = (msg @ code.g.astype(np.int64)) % 2
    sn = np.arange(n, dtype=np.uint64)
    w1 = _mix_np(base[:, None] ^ (((sn + np.uint64(k + 1)) * gold2) & _MASK))
    w2 = _mix_np(base[:, None] ^ (((sn + np.uint64(k + 1 + n)) * gold2) & _MASK))
    u1 = (w1 >> np.uint64(8)).astype(np.float64) / 16777216.0 + 0.5 / 16777216.0
    u2 = (w2 >> np.uint64(8)).astype(np.float64) / 16777216.0 + 0.5 / 16777216.0
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    llr = (1.0 - 2.0 * codeword) * (mean + sigma * z)
    return codeword, llr, words


def _kernel_words(fids, seed, n_streams):
    """Run the in-kernel hash through a tiny interpret-mode Pallas kernel."""
    from jax.experimental import pallas as pl

    b = fids.shape[0]

    def kern(f_ref, o_ref):
        base = mc_cascade._mix(f_ref[:] * mc_cascade._GOLD1 + jnp.int32(seed))
        sk = jax.lax.broadcasted_iota(jnp.int32, (b, n_streams), 1) + 1
        o_ref[:] = mc_cascade._stream_bits(base, sk)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n_streams), jnp.int32),
        interpret=True,
    )(jnp.asarray(fids, jnp.int32)[:, None])


def test_hash_words_match_numpy_golden():
    fids = np.array([0, 1, 2, 255, 1 << 20, (1 << 21) - 1], np.int64)
    got = np.asarray(_kernel_words(fids, seed=7, n_streams=16)).astype(
        np.uint32
    ).astype(np.uint64)
    gold1 = np.uint64(np.uint32(mc_cascade._GOLD1))
    gold2 = np.uint64(np.uint32(mc_cascade._GOLD2))
    base = _mix_np((fids.astype(np.uint64) * gold1 + np.uint64(7)) & _MASK)
    streams = np.arange(1, 17, dtype=np.uint64)
    want = _mix_np(base[:, None] ^ ((streams[None, :] * gold2) & _MASK))
    np.testing.assert_array_equal(got, want)


def test_hash_rng_moments():
    """Normal moments + bit balance of the counter-based generator."""
    code = get_code("ccsds_128_64")
    rng_fids = np.arange(4096, dtype=np.int64)
    codeword, llr, words = _sample_np(rng_fids, seed=3, code=code, sigma=1.0)
    # message bit balance
    bits = words & np.uint64(1)
    assert abs(bits.mean() - 0.5) < 0.005
    # BPSK-folded noise: llr * (1-2c) = 1 + z, z ~ N(0,1)
    z = llr * (1 - 2 * codeword) - 1.0
    assert abs(z.mean()) < 0.01
    assert abs(z.std() - 1.0) < 0.01
    assert abs((z ** 3).mean()) < 0.03  # skew
    assert abs((z ** 4).mean() - 3.0) < 0.1  # kurtosis


def test_cascade_counters_match_xla_twin():
    """Cascade counters == the definitionally expected counters computed from
    the numpy-golden samples + the XLA decoder (converged-at-T1 frames judged
    at T1, the rest at T).  Fixed seed; tolerance 2 frames for edge-kernel vs
    XLA matmul rounding on razor-edge soft values."""
    code = get_code("ccsds_128_64")
    from short_ldpc_decoding_osd_tpu.channel import sigma_for_snr

    B, T1, T, seed = 1024, 4, 8, 11
    snr = 3.0
    sigma = float(sigma_for_snr(snr, code.rate))
    params = nms.init_params("NMS-1")
    counters = np.asarray(
        mc_cascade.cascade_counters(
            code, params, "NMS-1", T, snr, B, seed, t1=T1,
            block_frames=256, mode="highest", interpret=True,
        )
    )
    # expected, from the golden sampler + XLA reference decoder
    codeword, llr, _ = _sample_np(np.arange(B), seed, code, sigma)
    h = jnp.asarray(code.h, jnp.float32)
    outs = np.asarray(
        nms.decode(params, h, jnp.asarray(llr, jnp.float32), T, "NMS-1")
    )  # (T+1, B, n)
    hard_t1 = (outs[T1] < 0).astype(np.int64)
    hard_t = (outs[T] < 0).astype(np.int64)
    synd_t1 = (code.h.astype(np.int64) @ hard_t1.T % 2).any(axis=0)
    conv = ~synd_t1
    hard_fin = np.where(conv[:, None], hard_t1, hard_t)
    err = hard_fin != codeword
    frame_err = err.any(axis=1)
    synd_fin = (code.h.astype(np.int64) @ hard_fin.T % 2).any(axis=0)
    detected = frame_err & synd_fin
    undetected = frame_err & ~synd_fin
    want = np.array([
        B, frame_err.sum(), err.sum(), detected.sum(), undetected.sum()
    ], np.float64)
    assert counters[0] == B
    np.testing.assert_allclose(counters, want, atol=2.0)


def test_cascade_overflow_retry():
    """Tiny forced capacity exercises the overflow-retry path."""
    code = get_code("ccsds_128_64")
    params = nms.init_params("NMS-1")
    # poison the calibration cache with an absurdly low fraction
    key_hit = {}
    orig = dict(mc_cascade._CAP_CACHE)
    try:
        mc_cascade._CAP_CACHE.clear()
        counters = np.asarray(
            mc_cascade.cascade_counters(
                code, params, "NMS-1", 6, 1.0, 512, 5, t1=2,
                block_frames=128, mode="highest", interpret=True,
            )
        )
        assert counters[0] == 512  # every frame accounted for
    finally:
        mc_cascade._CAP_CACHE.clear()
        mc_cascade._CAP_CACHE.update(orig)
        del key_hit
