#!/usr/bin/env python
"""Probe: can Mosaic lower an IN-KERNEL bit-unpack (int32 words -> bf16
0/1 lanes) feeding the lterm MXU matmul?  r4's unpack-avoidance attempts
crashed the remote compiler on other layouts; this is the r5 re-probe on
the current toolchain (r4 VERDICT item 4).

Measures: (a) bit-exactness vs lterm_reference, (b) kernel time vs the
production unpack_tail_columns + lterm_pallas chain.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from short_ldpc_decoding_osd_tpu.ops import osd_disc_pallas as odp
from short_ldpc_decoding_osd_tpu.ops.gf2_bitpack import unpack_tail_columns


def _lterm_packed_kernel(mw_ref, ul_ref, t_ref, out_ref, *,
                         bb, m, wlen, k_pad, off, k, nb):
    # in-VMEM bit expansion: (bb, m, wlen) int32 -> (bb*m, k_pad) bf16.
    # Mosaic cannot reshape (rows, wlen, 32) -> (rows, wlen*32) on the lane
    # axis, so expand each word to a 32-lane strip and concatenate the
    # static list of strips instead.
    words = mw_ref[:].reshape(bb * m, wlen)
    shifts = jnp.arange(32, dtype=jnp.int32)[None, :]
    strips = [
        (jax.lax.shift_right_logical(words[:, w][:, None], shifts) & 1)
        for w in range(wlen)
    ]
    cols = jnp.concatenate(strips, axis=1)  # (bb*m, wlen*32)
    mm = jax.lax.slice_in_dim(cols, off, off + k, axis=1).astype(jnp.bfloat16)
    if k_pad > k:
        mm = jnp.pad(mm, ((0, 0), (0, k_pad - k)))
    prods = jax.lax.dot_general(
        mm, t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a = prods - 2.0 * jnp.floor(prods * 0.5)
    a = a.reshape(bb, m, nb)
    out_ref[:] = jnp.sum(ul_ref[:][:, :, None] * a, axis=1)


@functools.partial(jax.jit, static_argnames=("off", "k", "interpret"))
def lterm_packed(mw, u_l, teps_flat, off: int, k: int, interpret=False):
    """mw: (B, m, wlen) int32 packed tail words; column j of M = bit
    (off + j) of the flattened word lanes."""
    b, m, wlen = mw.shape
    ntot = teps_flat.shape[0]
    nb = 512
    k_pad = -(-k // 128) * 128
    bb = odp.auto_frame_block(m, nb)
    b_pad = -(-b // bb) * bb
    n_pad = -(-ntot // nb) * nb
    mwp = jnp.zeros((b_pad, m, wlen), jnp.int32).at[:b].set(mw)
    ul = jnp.zeros((b_pad, m), jnp.float32).at[:b].set(u_l.astype(jnp.float32))
    tt = jnp.zeros((n_pad, k_pad), jnp.bfloat16)
    tt = tt.at[:ntot, :k].set(teps_flat.astype(jnp.bfloat16))
    out = pl.pallas_call(
        functools.partial(_lterm_packed_kernel, bb=bb, m=m, wlen=wlen,
                          k_pad=k_pad, off=off, k=k, nb=nb),
        grid=(b_pad // bb, n_pad // nb),
        in_specs=[
            pl.BlockSpec((bb, m, wlen), lambda bi, nj: (bi, 0, 0)),
            pl.BlockSpec((bb, m), lambda bi, nj: (bi, 0)),
            pl.BlockSpec((nb, k_pad), lambda bi, nj: (nj, 0)),
        ],
        out_specs=pl.BlockSpec((bb, nb), lambda bi, nj: (bi, nj)),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(mwp, ul, tt)
    return out[:b, :ntot]


def main():
    B, m, k, n = 4096, 64, 64, 128
    ntot = 1526
    rng = np.random.default_rng(0)
    # packed work-tensor tail as the GE leaves it: (m, nw, B) -> tail words
    mbits = rng.integers(0, 2, (B, m, k)).astype(np.int8)
    w0 = (n - k) // 32
    off = (n - k) - w0 * 32
    # pack columns (n-k)..n-1 into words w0.. with global bit positions
    full = np.zeros((B, m, n), np.int8)
    full[:, :, n - k:] = mbits
    words = full.reshape(B, m, -1, 32)
    weights = (1 << np.arange(32)).astype(np.int64)
    packed_all = (words * weights).sum(axis=3).astype(np.int64)
    mw = jnp.asarray(packed_all[:, :, w0:].astype(np.int32))
    ul = jnp.asarray(rng.normal(1.0, 0.3, (B, m)).astype(np.float32))
    teps = np.zeros((ntot, k), np.int8)
    for i in range(ntot):
        idx = rng.choice(k, size=rng.integers(1, 4), replace=False)
        teps[i, idx] = 1
    teps = jnp.asarray(teps)

    want = np.asarray(odp.lterm_reference(jnp.asarray(mbits), ul, teps))

    print("compiling packed kernel...", flush=True)
    t0 = time.time()
    got = np.asarray(lterm_packed(mw, ul, teps, off, k))
    print(f"compile+run {time.time()-t0:.1f}s", flush=True)
    err = np.abs(got - want).max()
    print(f"packed-kernel maxerr vs reference: {err:.3e}")

    # production chain for comparison: transpose+unpack then lterm_pallas
    packed_mnwb = jnp.asarray(
        np.transpose(packed_all, (1, 2, 0)).astype(np.int32))

    @jax.jit
    def chain_prod(pk, u, t):
        mm = unpack_tail_columns(pk, n, k)
        return odp.lterm_pallas(mm, u, t)

    got2 = np.asarray(chain_prod(packed_mnwb, ul, teps))
    print(f"prod-chain maxerr: {np.abs(got2 - want).max():.3e}")

    # axon dispatch is ~25-45 ms/call even async-enqueued: time an
    # IN-PROGRAM fori_loop of R kernel invocations (sum-accumulate defeats
    # DCE; each iteration's input is perturbed by the carry so iterations
    # cannot be CSE'd)
    R = 32

    def loop_time(f, *args):
        @jax.jit
        def run(a0, rest0):
            def body(i, acc):
                out = f(a0 + (acc.astype(a0.dtype) * 0), *rest0)
                return acc + out[0, 0]
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        a0, *rest = args
        np.asarray(run(a0, tuple(rest)))  # warm
        t0 = time.perf_counter()
        out = run(a0, tuple(rest))
        np.asarray(out)
        return (time.perf_counter() - t0) / R * 1e3

    t_packed = loop_time(
        lambda mw_, u, t: lterm_packed(mw_, u, t, off, k), mw, ul, teps)
    t_chain = loop_time(chain_prod, packed_mnwb, ul, teps)
    print(f"packed kernel: {t_packed:.3f} ms | unpack+lterm chain: "
          f"{t_chain:.3f} ms  (per-iter, R={R} in-program)")


if __name__ == "__main__":
    main()
