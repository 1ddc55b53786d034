#!/usr/bin/env python
"""Cost attribution for the bit-packed GE loop (`gf2_bitpack._reduce_packed`).

Times stripped variants of the 64-step elimination on the real chip to locate
the per-step cost before attempting a blocked (multi-pivot) rewrite:

  full       the production step (pivot + swap search + col swap + row swap +
             eliminate + col_order bookkeeping)
  noorder    col_order bookkeeping removed ((n, B) ops — ~3 passes of 2 MB)
  noswap     column-swap search + col-swap application removed (full-rank
             fast path; WRONG on deficient frames — timing only)
  elimonly   pivot search + eliminate only (no swaps, no order, no row swap)
  passes     K bare XOR passes over the packed tensor (HBM floor at the same
             step count)

All variants run the same fori_loop trip count (m) on the same (m, nw, B)
packed tensor.  Timing uses the amortized dispatch-chain trick
(profile_osd.py): K async dispatches + one scalar sync.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import functools

import jax
import jax.numpy as jnp

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import gf2_bitpack

B = int(os.environ.get("GE_BATCH", 4096))
REPS = int(os.environ.get("GE_REPS", 5))
CHAIN = int(os.environ.get("GE_CHAIN", 20))


@functools.partial(jax.jit, static_argnames=("m_steps", "variant"))
def _reduce_stripped(mat, col_order, m_steps, variant):
    m, nw, b = mat.shape
    n = col_order.shape[0]
    iota_m = jnp.arange(m, dtype=jnp.int32)[:, None]
    iota_w = jnp.arange(nw, dtype=jnp.int32)[:, None]
    iota_n = jnp.arange(n, dtype=jnp.int32)[:, None]
    word_of_n = jnp.asarray(np.arange(n) // 32, jnp.int32)
    bit_of_n = jnp.asarray(
        (np.int64(1) << (np.arange(n) % 32)).astype(np.int32))[:, None]
    full = jnp.int32(-1)
    zero = jnp.int32(0)

    if variant == "passes":
        def step(t, carry):
            mat, col_order = carry
            mat = mat ^ jnp.left_shift(jnp.int32(1), t % 31)
            return mat, col_order
        return jax.lax.fori_loop(0, m_steps, step, (mat, col_order))

    def step(t, carry):
        mat, col_order = carry
        jw = t // 32
        jb = t % 32
        bit_t = jnp.left_shift(jnp.int32(1), jb)
        word_t = jax.lax.dynamic_slice_in_dim(mat, jw, 1, axis=1)[:, 0, :]
        col_t = (word_t & bit_t) != 0
        cm = col_t & (iota_m >= t)
        has_p = jnp.any(cm, axis=0, keepdims=True)
        pivot_row = jnp.argmax(cm, axis=0)[None, :].astype(jnp.int32)
        row_t = jax.lax.dynamic_slice_in_dim(mat, t, 1, axis=0)[0]
        tmask = jnp.where(iota_w == jw, bit_t, zero)

        if variant in ("full", "noorder"):
            mask_hi = -jnp.left_shift(jnp.int32(2), jb)
            wmask = jnp.where(
                iota_w < jw, zero, jnp.where(iota_w == jw, mask_hi, full))
            cand = row_t & wmask & jnp.where(has_p, zero, full)
            low = cand & -cand
            nz = low != 0
            seen = jnp.zeros((1, b), dtype=bool)
            sc_words = []
            for w in range(nw):
                sc_words.append(jnp.where(seen[0] | ~nz[w], zero, low[w]))
                seen = seen | nz[w][None, :]
            scmask = jnp.stack(sc_words, axis=0)
            sc_any = seen
            s_col = jnp.any((mat & scmask[None, :, :]) != 0, axis=1)
            dcol = (s_col ^ col_t) & sc_any
            cmask = scmask | tmask
        else:
            scmask = jnp.zeros((nw, b), jnp.int32)
            sc_any = jnp.zeros((1, b), dtype=bool)
            dcol = jnp.zeros((m, b), dtype=bool)
            cmask = jnp.broadcast_to(tmask, (nw, b))

        oh_pr = iota_m == pivot_row
        pr_gated = oh_pr & has_p
        if variant == "elimonly":
            # eliminate with the pivot row in place (no row swap)
            piv = jnp.sum(jnp.where(pr_gated[:, None, :], mat, zero), axis=0)
            colv = col_t & ~pr_gated & jnp.broadcast_to(has_p, (m, b))
            upd = jnp.where(colv, full, zero)[:, None, :] & piv[None, :, :]
            mat = mat ^ upd
            return mat, col_order
        p_row = jnp.sum(jnp.where(pr_gated[:, None, :], mat, zero), axis=0)
        dcol_at_t = jnp.any((iota_m == t) & dcol, axis=0)[None, :]
        dcol_at_pr = jnp.any(pr_gated & dcol, axis=0)[None, :]
        row_t2 = row_t ^ (cmask & jnp.where(dcol_at_t, full, zero))
        p_row2 = p_row ^ (cmask & jnp.where(dcol_at_pr, full, zero))
        drow = (p_row2 ^ row_t2) & jnp.where(has_p, full, zero)
        rmask = (iota_m == t) | pr_gated
        piv = row_t2 ^ drow
        drow_at_tcol = jnp.any((drow & tmask) != 0, axis=0)[None, :]
        new_col_t = (col_t ^ dcol) ^ (rmask & drow_at_tcol)
        colv = new_col_t & (iota_m != t)
        upd = (
            (cmask[None, :, :] & jnp.where(dcol, full, zero)[:, None, :])
            ^ (jnp.where(rmask, full, zero)[:, None, :] & drow[None, :, :])
            ^ (jnp.where(colv, full, zero)[:, None, :] & piv[None, :, :])
        )
        mat = mat ^ upd

        if variant == "full":
            oh_sc = (scmask[word_of_n, :] & bit_of_n) != 0
            oh_t = iota_n == t
            ord_t = jax.lax.dynamic_slice_in_dim(col_order, t, 1, axis=0)
            ord_sc = jnp.sum(jnp.where(oh_sc, col_order, zero), axis=0)[None, :]
            d_ord = jnp.where(sc_any, ord_sc - ord_t, zero)
            col_order = col_order + jnp.where(oh_t, d_ord, zero) - jnp.where(
                oh_sc, d_ord, zero)
        return mat, col_order

    return jax.lax.fori_loop(0, m_steps, step, (mat, col_order))


def main():
    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(0)
    h = np.broadcast_to(code.h, (B, *code.h.shape))
    # random column permutation per frame (the OSD workload shape)
    perm = np.argsort(rng.random((B, code.n)), axis=1)
    hb = np.take_along_axis(h, perm[:, None, :], axis=2).astype(np.int8)
    mat0 = gf2_bitpack.pack_columns(jnp.asarray(hb))
    order0 = jnp.broadcast_to(
        jnp.arange(code.n, dtype=jnp.int32)[:, None], (code.n, B))
    m = code.h.shape[0]

    for variant in ("full", "noorder", "noswap", "elimonly", "passes"):
        out = _reduce_stripped(mat0, order0, m, variant)
        np.asarray(jnp.sum(out[0]))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            outs = [_reduce_stripped(mat0, order0, m, variant)
                    for _ in range(CHAIN)]
            np.asarray(sum(jnp.sum(o[0]) for o in outs))
            best = min(best, (time.perf_counter() - t0) / CHAIN)
        print(f"{variant:9s} {best*1e3:7.2f} ms  ({B/best:,.0f} frames/s)")

    # glue attribution: pack / unpack / identify_mrb post-processing on
    # device-resident inputs
    from short_ldpc_decoding_osd_tpu.ops import gf2ops

    hb_dev = jnp.asarray(hb)
    hb_dev = jax.device_put(hb_dev)
    np.asarray(jnp.sum(hb_dev.astype(jnp.float32)))
    packed = gf2_bitpack.pack_columns(hb_dev)
    reduced_packed, _ = _reduce_stripped(mat0, order0, m, "full")

    pack_j = jax.jit(gf2_bitpack.pack_columns)
    unpack_j = jax.jit(
        lambda p: gf2_bitpack.unpack_columns(p, code.n))
    mrb_j = jax.jit(lambda h: gf2ops.identify_mrb(h, code.k))

    for name, fn, arg in (
        ("pack", pack_j, hb_dev),
        ("unpack", unpack_j, reduced_packed),
        ("mrb e2e", mrb_j, hb_dev),
    ):
        out = fn(arg)
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                           .astype(jnp.float32)))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            outs = [fn(arg) for _ in range(CHAIN)]
            np.asarray(sum(jnp.sum(jax.tree_util.tree_leaves(o)[0]
                                   .astype(jnp.float32)) for o in outs))
            best = min(best, (time.perf_counter() - t0) / CHAIN)
        print(f"{name:9s} {best*1e3:7.2f} ms  ({B/best:,.0f} frames/s)")

    # reference: the production kernel end-to-end
    out = gf2_bitpack.batched_row_reduce_bitpack(jnp.asarray(hb))
    np.asarray(jnp.sum(out[1]))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = [gf2_bitpack.batched_row_reduce_bitpack(jnp.asarray(hb))
                for _ in range(CHAIN)]
        np.asarray(sum(jnp.sum(o[1]) for o in outs))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    print(f"{'prod e2e':9s} {best*1e3:7.2f} ms  ({B/best:,.0f} frames/s)")


if __name__ == "__main__":
    main()
