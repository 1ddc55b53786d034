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


def test_dl_osd_step_demotes_on_kernel_failure(monkeypatch, recwarn):
    """A Mosaic lowering/VMEM failure of the fused TEP-discrepancy kernel
    must demote make_dl_osd_step to the chunk-scan path, not kill the eval
    sweep (same policy as the MC kernel ladder)."""
    import warnings as _w

    from short_ldpc_decoding_osd_tpu.codes import get_code
    from short_ldpc_decoding_osd_tpu.models import make_dia
    from short_ldpc_decoding_osd_tpu.osd import engine, segments

    code = get_code("ccsds_128_64")
    # force the TPU default so the fast path traces lterm_pallas; on the
    # CPU backend that fails with the real "Only interpret mode" Mosaic
    # error — exactly the demote class
    monkeypatch.setattr(engine.jax, "default_backend", lambda: "tpu")

    rng = np.random.default_rng(7)
    b, t1 = 6, 8
    model = make_dia("model_cnn", code.n, t1)
    dia_params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((code.n, t1, 1)))
    msgs = rng.integers(0, 2, (b, code.k))
    words = (msgs @ code.g % 2).astype(np.int32)
    noise = rng.normal(1.0, 0.9, (b, t1, code.n))
    traj = jnp.asarray(np.where(words[:, None, :] == 0, noise, -noise),
                       jnp.float32)
    path = [[0] * 6, [1, 0, 0, 0, 0, 0], [0, 1, 0, 0, 0, 0],
            [0, 0, 1, 0, 0, 0], [0, 0, 0, 1, 0, 0]]
    blocks, acc = segments.build_tep_blocks(path, code.k, 6)
    teps, mask, bounds = segments.pack_tep_chunks(blocks, chunk=64)
    fcn = {"w1": jnp.zeros((6, 6), jnp.float32),
           "w2": jnp.zeros((6, 2), jnp.float32)}
    step = engine.make_dl_osd_step(model, code.h_osd, code.k, bounds=bounds)
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        out, refined = step(
            dia_params, traj, jnp.asarray(words), jnp.asarray(teps),
            jnp.asarray(mask), jnp.asarray(acc, jnp.int32), fcn,
        )
    assert out["success"].shape == (b,)
    # the demoted path equals the explicit scan path
    prep = engine.prepare(refined, traj[:, 0], jnp.asarray(words),
                          jnp.asarray(code.h_osd), code.k)
    want = engine.sliding_osd(
        prep, jnp.asarray(teps), jnp.asarray(mask),
        jnp.asarray(acc, jnp.int32), fcn, code.k, bounds=bounds,
        use_kernel=False,
    )
    np.testing.assert_array_equal(np.asarray(out["success"]),
                                  np.asarray(want["success"]))
    np.testing.assert_array_equal(np.asarray(out["complexity"]),
                                  np.asarray(want["complexity"]))
