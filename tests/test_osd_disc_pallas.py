"""Fused TEP-discrepancy kernel (ops/osd_disc_pallas) vs the XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from short_ldpc_decoding_osd_tpu.ops import osd_disc_pallas as odp


def _case(b, m, k, ntot, seed):
    rng = np.random.default_rng(seed)
    m_mat = jnp.asarray(rng.integers(0, 2, (b, m, k)), jnp.int8)
    u_l = jnp.asarray(rng.normal(0, 1.5, (b, m)), jnp.float32)
    teps = jnp.asarray(rng.integers(0, 2, (ntot, k)), jnp.int8)
    return m_mat, u_l, teps


def test_lterm_kernel_matches_reference_interpret():
    for b, m, k, ntot, seed in (
        (16, 64, 64, 700, 0),      # CCSDS shapes, unaligned Ntot
        (5, 61, 60, 130, 1),       # rank-deficient 121_60-like, odd B
        (8, 128, 128, 512, 2),     # 256_128 shapes
    ):
        m_mat, u_l, teps = _case(b, m, k, ntot, seed)
        got = np.asarray(odp.lterm_pallas(m_mat, u_l, teps, interpret=True))
        want = np.asarray(odp.lterm_reference(m_mat, u_l, teps))
        scale = np.maximum(np.abs(want), 1.0)
        assert (np.abs(got - want) / scale).max() < 1e-5


def test_disc_flat_chunked_matches_scan_path(monkeypatch):
    """engine._disc_flat_chunked (flat path, reference branch on CPU) equals
    the per-chunk scan path it replaced."""
    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.osd import engine, segments

    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(3)
    b = 12
    msgs = rng.integers(0, 2, (b, code.k))
    words = (msgs @ code.g % 2).astype(np.int64)
    noise = rng.normal(1.0, 0.9, (b, code.n))
    original = jnp.asarray(
        np.where(words == 0, noise, -noise), jnp.float32
    )
    refined = original * jnp.asarray(rng.uniform(0.8, 1.2, (b, code.n)),
                                     jnp.float32)
    prep = engine.prepare(refined, original, jnp.asarray(words, jnp.int32),
                          jnp.asarray(code.h_osd), code.k)
    path = [[0] * 6, [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
            [2, 0, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0]]
    blocks, acc = segments.build_tep_blocks(path, code.k, 6)
    teps, mask, bounds = segments.pack_tep_chunks(blocks, chunk=64)
    teps_j, mask_j = jnp.asarray(teps), jnp.asarray(mask)

    flat = np.asarray(engine._disc_flat_chunked(prep, teps_j, mask_j, code.k))
    disc = engine._block_disc_scan(prep, teps_j, mask_j, code.k, None)
    want = np.asarray(jnp.transpose(disc, (1, 0, 2)).reshape(b, -1))
    scale = np.maximum(np.abs(want), 1.0)
    assert (np.abs(flat - want) / scale).max() < 1e-5
    # minima/argmins through the public entry agree block for block
    minima, argmins = engine.block_discrepancy_minima(
        prep, teps_j, mask_j, code.k, bounds=bounds
    )
    ref_min, ref_arg = engine.block_discrepancy_minima(
        prep, jnp.asarray(segments.stack_padded_blocks(blocks)[0]),
        jnp.asarray(segments.stack_padded_blocks(blocks)[1]), code.k,
    )
    np.testing.assert_allclose(np.asarray(minima), np.asarray(ref_min),
                               rtol=1e-5, atol=1e-5)
