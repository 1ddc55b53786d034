"""Bit-packed batched GF(2) elimination: frames as lanes, columns as bits.

The f32 kernels (``gf2ops.batched_row_reduce``, and the retired
``gf2_pallas`` VMEM variant) spend one
vector lane per matrix *entry*: every pivot step touches ``B*m*n`` f32
elements.  Here the work tensor is ``(m, n/32, B)`` int32 — column ``j`` of
frame ``b`` lives in bit ``j%32`` of word ``[i, j//32, b]`` — so

* the batch axis ``B`` maps to VPU *lanes* (no cross-frame interaction ever
  happens, so no lane shuffles are needed anywhere);
* the row axis ``m`` maps to sublanes, where the per-frame pivot search is a
  native ``argmax`` (first set row) like the f32 kernels;
* the column-swap search ("first column > t with a 1 in row t", reference
  ``full_gf2elim`` at ``DL_OSD_Testing_serial/ordered_statistics_decoding.py:222-257``)
  becomes the classic lowest-set-bit trick ``x & -x`` on the packed row,
  walked over the (few) words;
* row/column swaps and the elimination XOR are single fused bitwise passes
  over the 32x-smaller packed tensor.

The pivot/column-swap semantics are exactly those of
``gf2ops.batched_row_reduce`` (bit-exact on full-row-rank inputs; degenerate
no-pivot/no-swap steps are a no-op).  Pure XLA —
the packed tensor for 4096 CCSDS frames is 4 MB, so the per-step HBM
round-trip costs microseconds and no Pallas kernel is needed.

Measured on v5e (B=4096, CCSDS): the elimination loop is ~2 ms (vs 50 ms
for the f32 Pallas kernel); the full identify_mrb with MXU-packed input
(``pack_permuted``), tail-only unpack and bit-plane order tags is ~6 ms —
see scripts/ge_probe.py and scripts/packing_probe.py for the per-component
attribution that drove the round-3 redesign (the wrapper was
data-movement-bound: dense permute/pack/unpack passes cost ~2 ms EACH, and
the dense (n, B) order bookkeeping was ~40% of the loop).  A VMEM-resident
Pallas twin of this layout was tried and REJECTED: Mosaic lowered the
sublane folds/masked selects ~2x slower than XLA's fusion of the same ops
(11 ms), and the compiler crashed outright at >=2048-lane blocks.  Loop
unrolling (2/4/8) does not help — the remaining per-step cost is the
elimination dependency chain's HBM traffic, not loop overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pack_columns(h_batch: jnp.ndarray) -> jnp.ndarray:
    """(B, m, n) 0/1 -> (m, ceil(n/32), B) int32, bit j%32 of word j//32 = col j."""
    b, m, n = h_batch.shape
    nw = -(-n // 32)
    x = h_batch.astype(jnp.int32)
    if nw * 32 != n:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, nw * 32 - n)))
    x = x.reshape(b, m, nw, 32)
    bits = jnp.arange(32, dtype=jnp.int32)
    words = jnp.sum(jnp.left_shift(x, bits[None, None, None, :]), axis=3)
    return jnp.transpose(words, (1, 2, 0))  # (m, nw, B)


def unpack_columns(packed: jnp.ndarray, n: int, dtype=jnp.int8) -> jnp.ndarray:
    """(m, nw, B) int32 -> (B, m, n) 0/1 of ``dtype``."""
    m, nw, b = packed.shape
    word_of = np.arange(n) // 32  # static gathers
    bit_of = jnp.asarray((np.int64(1) << (np.arange(n) % 32)).astype(np.int32))
    sel = packed[:, word_of, :]  # (m, n, B)
    bits = (sel & bit_of[None, :, None]) != 0
    return jnp.transpose(bits, (2, 0, 1)).astype(dtype)


def pack_permuted(invperm: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Column-permuted + bit-packed work tensor straight from the MXU.

    ``invperm`` is the (B, n) INVERSE reliability permutation — original
    column ``j`` lands at position ``invperm[b, j]``.  Instead of forming
    the dense (B, m, n) permuted matrix and then packing it (two ~2 ms
    passes at B=4096 on v5e — as expensive as the entire 64-step
    elimination, see scripts/packing_probe.py), compose the permutation with
    the packing weights arithmetically and let one MXU matmul emit the
    packed words directly:

        words[b, i, w] = Σ_bit h[i, perm[b, 32w+bit]] << bit
                       = Σ_j h[i, j] · W2[b, j, w]

    where ``W2[b, j, w] = 2^(invperm[b,j] % 32)`` at ``w == invperm//32``
    (a 16 MB elementwise build — no (B, n, n) one-hot anywhere).
    Exactness: each half-word (lo/hi 16 bits, separate W2 planes) is a sum
    of ≤ 16 DISTINCT powers of two < 2^16 — exactly representable in f32 —
    and ``Precision.HIGHEST`` makes the TPU matmul f32-exact."""
    b, n = invperm.shape
    nw = -(-n // 32)
    pos = invperm.astype(jnp.int32)
    word = pos // 32
    bit = pos % 32
    half = bit // 16
    # exact powers of two via integer shift (exp2 lowers to an APPROXIMATE
    # exp on TPU and misses e.g. 2^15 by 1 ulp); values < 2^24 cast exactly
    val = jnp.left_shift(jnp.int32(1), bit % 16).astype(jnp.float32)
    sel = (
        (word[..., None] == jnp.arange(nw, dtype=jnp.int32))[..., None]
        & (half[..., None, None] == jnp.arange(2, dtype=jnp.int32))
    )
    w2 = jnp.where(sel, val[..., None, None], 0.0)  # (B, n, nw, 2)
    hi = jax.lax.Precision.HIGHEST
    parts = jnp.einsum("ij,bjwh->biwh", h.astype(jnp.float32), w2,
                       precision=hi)
    words = parts[..., 0].astype(jnp.int32) | jnp.left_shift(
        parts[..., 1].astype(jnp.int32), 16
    )
    return jnp.transpose(words, (1, 2, 0))  # (m, nw, B)


def unpack_tail_columns(packed: jnp.ndarray, n: int, k: int,
                        dtype=jnp.int8) -> jnp.ndarray:
    """Dense (B, m, k) of the LAST k columns only (the M-matrix source).

    Transposes the 32×-smaller packed tensor first, then bit-expands — the
    production ``unpack_columns`` gathers a (m, n, B) int32 intermediate and
    transposes the dense result, which costs ~2 ms at B=4096 for data the
    M matrix never reads (the leading n-k columns are the identity)."""
    m, nw, b = packed.shape
    w0 = (n - k) // 32
    x = jnp.transpose(packed[:, w0:, :], (2, 0, 1))  # (B, m, nw-w0)
    bit_of = jnp.left_shift(jnp.int32(1), jnp.arange(32, dtype=jnp.int32))
    bits = (x[..., None] & bit_of) != 0
    cols = bits.reshape(b, m, (nw - w0) * 32)
    off = (n - k) - w0 * 32
    return cols[:, :, off:off + k].astype(dtype)


def pack_positions(bits: jnp.ndarray, nw: int) -> jnp.ndarray:
    """(n, B) 0/1 -> (nw, B) int32: position p -> bit p%32 of word p//32."""
    n, b = bits.shape
    x = bits.astype(jnp.int32)
    if nw * 32 != n:
        x = jnp.pad(x, ((0, nw * 32 - n), (0, 0)))
    x = x.reshape(nw, 32, b)
    shifts = jnp.arange(32, dtype=jnp.int32)[None, :, None]
    return jnp.sum(jnp.left_shift(x, shifts), axis=1)


@functools.partial(jax.jit, static_argnames=("m_steps",))
def _reduce_packed(mat: jnp.ndarray, col_order: jnp.ndarray, m_steps: int):
    """Core loop over ``m_steps`` pivots on the packed (m, nw, B) tensor."""
    m, nw, b = mat.shape
    n = col_order.shape[0]
    iota_m = jnp.arange(m, dtype=jnp.int32)[:, None]  # (m, 1)
    iota_w = jnp.arange(nw, dtype=jnp.int32)[:, None]  # (nw, 1)
    word_of_n = jnp.asarray(np.arange(n) // 32, jnp.int32)
    bit_of_n = jnp.asarray(
        (np.int64(1) << (np.arange(n) % 32)).astype(np.int32)
    )[:, None]  # (n, 1)
    full = jnp.int32(-1)
    zero = jnp.int32(0)

    # --- col_order as bit-plane tags -------------------------------------
    # The order bookkeeping used to run three (n, B) passes per step (~40%
    # of the loop, scripts/ge_probe.py "full" vs "noorder").  Instead carry
    # the order as L = ceil(log2 n) bit-planes in the SAME packed layout as
    # the matrix — plane l, word w, bit j, lane b = bit l of the original
    # position currently at column 32w+j of frame b.  A column swap is then
    # a conditional cmask XOR per plane (two (L, nw, B) passes, 13x less
    # traffic than the dense update); the dense (n, B) order is decoded once
    # after the loop.
    levels = max(1, int(n - 1).bit_length())
    tags = jnp.stack(
        [
            pack_positions(((col_order >> l) & 1).astype(jnp.int32), nw)
            for l in range(levels)
        ],
        axis=0,
    )  # (L, nw, B)

    def step(t, carry):
        mat, tags = carry
        jw = t // 32
        jb = t % 32
        bit_t = jnp.left_shift(jnp.int32(1), jb)

        word_t = jax.lax.dynamic_slice_in_dim(mat, jw, 1, axis=1)[:, 0, :]  # (m,B)
        col_t = (word_t & bit_t) != 0  # (m, B) bool
        cm = col_t & (iota_m >= t)
        has_p = jnp.any(cm, axis=0, keepdims=True)  # (1, B)
        pivot_row = jnp.argmax(cm, axis=0)[None, :].astype(jnp.int32)  # (1, B)

        # --- swap-column search: first set bit > t in row t (packed) ---
        row_t = jax.lax.dynamic_slice_in_dim(mat, t, 1, axis=0)[0]  # (nw, B)
        # word mask zeroing bits <= t:  -(2 << jb) == bits jb+1.. (0 at jb=31)
        mask_hi = -jnp.left_shift(jnp.int32(2), jb)
        wmask = jnp.where(iota_w < jw, zero, jnp.where(iota_w == jw, mask_hi, full))
        cand = row_t & wmask & jnp.where(has_p, zero, full)  # (nw, B)
        low = cand & -cand  # per-word lowest set bit
        nz = low != 0
        seen = jnp.zeros((1, b), dtype=bool)
        sc_words = []
        for w in range(nw):  # static, nw is small
            sc_words.append(jnp.where(seen[0] | ~nz[w], zero, low[w]))
            seen = seen | nz[w][None, :]
        scmask = jnp.stack(sc_words, axis=0)  # (nw, B): <=1 bit set per frame
        sc_any = seen  # (1, B) bool

        # --- column swap t <-> sc (packed masks; dcol gated by sc_any) ---
        s_col = jnp.any((mat & scmask[None, :, :]) != 0, axis=1)  # (m, B)
        dcol = (s_col ^ col_t) & sc_any  # (m, B) bool
        tmask = jnp.where(iota_w == jw, bit_t, zero)  # (nw, 1)
        cmask = scmask | tmask  # (nw, B)

        # --- row swap t <-> pivot_row on the post-col-swap matrix, with the
        # post-swap rows derived algebraically (no re-read) ---
        oh_pr = iota_m == pivot_row  # (m, B) bool (pr==t harmless)
        pr_gated = oh_pr & has_p
        p_row = jnp.sum(jnp.where(pr_gated[:, None, :], mat, zero), axis=0)  # (nw,B)
        dcol_at_t = jnp.any((iota_m == t) & dcol, axis=0)[None, :]
        dcol_at_pr = jnp.any(pr_gated & dcol, axis=0)[None, :]
        row_t2 = row_t ^ (cmask & jnp.where(dcol_at_t, full, zero))
        p_row2 = p_row ^ (cmask & jnp.where(dcol_at_pr, full, zero))
        drow = (p_row2 ^ row_t2) & jnp.where(has_p, full, zero)  # (nw, B)
        rmask = (iota_m == t) | pr_gated  # (m, B) bool

        # --- elimination of column t outside row t (derived pivot row) ---
        piv = row_t2 ^ drow  # final row t, (nw, B)
        drow_at_tcol = jnp.any((drow & tmask) != 0, axis=0)[None, :]  # (1, B)
        new_col_t = (col_t ^ dcol) ^ (rmask & drow_at_tcol)
        colv = new_col_t & (iota_m != t)  # (m, B) bool

        # one fused XOR pass (the three terms commute under XOR)
        upd = (
            (cmask[None, :, :] & jnp.where(dcol, full, zero)[:, None, :])
            ^ (jnp.where(rmask, full, zero)[:, None, :] & drow[None, :, :])
            ^ (jnp.where(colv, full, zero)[:, None, :] & piv[None, :, :])
        )
        mat = mat ^ upd

        # --- order-tag swap t <-> sc (conditional cmask XOR per plane) ---
        tag_t = (
            jax.lax.dynamic_slice_in_dim(tags, jw, 1, axis=1)[:, 0, :] & bit_t
        ) != 0  # (L, B)
        tag_sc = jnp.any((tags & scmask[None, :, :]) != 0, axis=1)  # (L, B)
        diff = (tag_t ^ tag_sc) & sc_any  # (L, B): swap only where bits differ
        tags = tags ^ (
            cmask[None, :, :] & jnp.where(diff[:, None, :], full, zero)
        )
        return mat, tags

    mat, tags = jax.lax.fori_loop(0, m_steps, step, (mat, tags))
    # decode the planes back to the dense (n, B) order
    planes = (tags[:, word_of_n, :] & bit_of_n[None]) != 0  # (L, n, B)
    weights = jnp.left_shift(
        jnp.int32(1), jnp.arange(levels, dtype=jnp.int32)
    )[:, None, None]
    col_order = jnp.sum(
        jnp.where(planes, weights, 0), axis=0, dtype=jnp.int32
    )
    return mat, col_order


@jax.jit
def batched_row_reduce_bitpack(h_batch: jnp.ndarray):
    """Drop-in replacement for ``gf2ops.batched_row_reduce`` (bit-packed).

    Returns ``(reduced (B, m, n) int8, col_order (B, n) int32)``.
    """
    b, m, n = h_batch.shape
    mat = pack_columns(h_batch)
    col_order = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, b)
    )
    mat, col_order = _reduce_packed(mat, col_order, m_steps=m)
    return unpack_columns(mat, n), jnp.transpose(col_order, (1, 0))
