"""Batched, fixed-shape GF(2) Gaussian elimination for OSD — the hard kernel.

The reference runs a Python loop with dynamic row deletion and column swaps
per frame (``full_gf2elim``, ``DL_OSD_Testing_serial/ordered_statistics_decoding.py:222-257``)
inside ``identify_mrb`` (``:43-80``).  That is unusable on TPU.  Here the
elimination is a ``lax.fori_loop`` of exactly ``m`` fixed-shape steps, vmapped
over the batch, with the *same pivot/column-swap semantics*:

at step t (row cursor == column cursor == t for a full-row-rank H):
  1. if column t has a 1 in rows t.., pivot on the first such row (row swap);
  2. else swap in the first column c > t with ``M[t, c] == 1`` (recorded in
     the column-order vector, exactly like the reference's
     ``record_col_exchange_index`` bookkeeping);
  3. XOR-eliminate the pivot column everywhere else (full RREF).

The 0/1 work tensor is int8 ``[B, m, n]`` — 64x128 per frame for the CCSDS
code; each step is a masked select + an outer-product XOR, all VPU-friendly.
A bit-packed Pallas variant can slot in behind the same interface later.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("assume_full_rank",))
def batched_row_reduce(h_batch: jnp.ndarray, assume_full_rank: bool = True):
    """Reduce each (m, n) 0/1 matrix in the batch to RREF with column swaps.

    Args:
      h_batch: (B, m, n) 0/1 matrices (any integer/bool dtype).

    Returns:
      reduced: (B, m, n) int8 RREF matrices (leading m x m block = identity).
      col_order: (B, n) int32; ``col_order[b, pos]`` = original column index
        now at ``pos`` (the reference's swap-updated ``index_order``).
    """
    del assume_full_rank
    mat = h_batch.astype(jnp.int8)
    batch, m, n = mat.shape
    col_order0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (batch, n))
    row_ids = jnp.arange(m, dtype=jnp.int32)
    col_ids = jnp.arange(n, dtype=jnp.int32)

    def step(t, carry):
        # swaps are expressed as one-hot masked selects (no batched gathers —
        # per-frame dynamic gathers serialize badly on TPU)
        mat, col_order = carry
        col_t = mat[:, :, t]  # (B, m)
        valid_rows = row_ids[None, :] >= t
        col_masked = jnp.where(valid_rows, col_t, 0)
        has_pivot = jnp.any(col_masked > 0, axis=1)  # (B,)
        pivot_row = jnp.argmax(col_masked, axis=1)  # first 1 in rows t..

        # --- case 2: column swap (first c > t with mat[t, c] == 1) ---
        row_t = mat[:, t, :]  # (B, n)
        right_mask = col_ids[None, :] > t
        row_masked = jnp.where(right_mask, row_t, 0)
        swap_col = jnp.argmax(row_masked, axis=1)  # (B,)
        swap_col = jnp.where(has_pivot, t, swap_col)

        # columns t <-> swap_col via one-hot select
        is_t_col = col_ids[None, :] == t  # (1, n)
        is_swap_col = col_ids[None, :] == swap_col[:, None]  # (B, n)
        swap_col_vals = jnp.einsum(
            "bn,bmn->bm", is_swap_col.astype(jnp.float32),
            mat.astype(jnp.float32), preferred_element_type=jnp.float32,
        ).astype(jnp.int8)  # column at swap_col
        t_col_vals = mat[:, :, t]
        mat = jnp.where(is_t_col[:, None, :], swap_col_vals[:, :, None], mat)
        mat = jnp.where(is_swap_col[:, None, :], t_col_vals[:, :, None], mat)
        ord_t = col_order[:, t]
        ord_swap = jnp.sum(
            jnp.where(is_swap_col, col_order, 0), axis=1
        )
        col_order = jnp.where(is_t_col, ord_swap[:, None], col_order)
        col_order = jnp.where(is_swap_col, ord_t[:, None], col_order)

        # rows t <-> pivot_row via one-hot select
        pr = jnp.where(has_pivot, pivot_row, t)
        is_t_row = row_ids[None, :] == t  # (1, m)
        is_p_row = row_ids[None, :] == pr[:, None]  # (B, m)
        p_row_vals = jnp.einsum(
            "bm,bmn->bn", is_p_row.astype(jnp.float32),
            mat.astype(jnp.float32), preferred_element_type=jnp.float32,
        ).astype(jnp.int8)
        t_row_vals = mat[:, t, :]
        mat = jnp.where(is_t_row[:, :, None], p_row_vals[:, None, :], mat)
        mat = jnp.where(is_p_row[:, :, None], t_row_vals[:, None, :], mat)

        # eliminate column t everywhere except row t
        pivot_vec = mat[:, t, :]  # (B, n)
        col_vec = mat[:, :, t]  # (B, m)
        col_vec = col_vec * (row_ids[None, :] != t)
        mat = mat ^ (col_vec[:, :, None] * pivot_vec[:, None, :])
        return mat, col_order

    mat, col_order = jax.lax.fori_loop(0, m, step, (mat, col_order0))
    return mat, col_order


def identify_mrb(h_batch: jnp.ndarray, k: int):
    """Batched MRB identification after reliability-ordered elimination.

    Port of the *semantics* of ``identify_mrb``
    (``DL_OSD_Testing_serial/ordered_statistics_decoding.py:43-80``): run the
    elimination on reliability-sorted H, then re-sort the k MRB positions
    ascending by their (already reliability-ranked) indices.

    Args:
      h_batch: (B, m, n) reliability-column-permuted parity matrices.
      k: message length (n - m for full-rank H).

    Returns dict with:
      m_matrix: (B, m, k) int8 — MRB -> LRB re-encode map (columns sorted by
        ascending original position).
      index_order: (B, n) int32 — final position -> reliability-rank mapping
        (first n-k = LRB, last k = MRB ascending).
      swap_len: (B,) int32 — number of MRB members swapped in from the
        nominal LRB region (reference's ``swap_len_list``).
      lrb_swap_positions: (B, n-k) int8 — indicator over final LRB slots of
        "position came from the tail region" (reference's
        ``swap_lrb_position_list`` with its ``jump_point`` rule), needs
        ``threshold_sum`` via ``jump_point`` argument of
        :func:`lrb_swap_indicator` — computed separately to keep this
        function threshold-free.
    """
    batch, m, n = h_batch.shape
    if jax.default_backend() == "tpu":
        # bit-packed frames-as-lanes elimination: ~2x the f32 Pallas kernel at
        # B=4k and ~9x at B=64k on v5e (see ops/gf2_bitpack.py); bit-exact
        from .gf2_bitpack import batched_row_reduce_bitpack

        reduced, col_order = batched_row_reduce_bitpack(h_batch)
    else:
        reduced, col_order = batched_row_reduce(h_batch)
    return _mrb_post(reduced[:, :, n - k:], col_order, n, k)


def identify_mrb_from_perm(perm: jnp.ndarray, h: jnp.ndarray, k: int,
                           use_packed: bool | None = None):
    """:func:`identify_mrb` without ever materializing the dense permuted
    matrix.

    ``perm`` is the (B, n) reliability permutation (ascending |input|) and
    ``h`` the STATIC (m, n) parity matrix.  On TPU the permuted+packed work
    tensor comes straight off the MXU (``gf2_bitpack.pack_permuted``) and
    only the k M-matrix columns are unpacked after elimination
    (``unpack_tail_columns``) — the dense (B, m, n) permute/pack/unpack
    passes cost ~2 ms EACH at B=4096 on v5e, as much as the whole 64-step
    elimination loop (scripts/ge_probe.py / packing_probe.py).  Bit-exact
    vs ``identify_mrb(permute_columns(perm, h), k)``."""
    b, n = perm.shape
    m = h.shape[0]
    if use_packed is None:
        use_packed = jax.default_backend() == "tpu"
    if use_packed:
        from .gf2_bitpack import (
            _reduce_packed,
            pack_permuted,
            unpack_tail_columns,
        )

        invperm = jnp.argsort(perm, axis=-1)  # perm is a permutation: exact
        packed = pack_permuted(invperm, jnp.asarray(h))
        col_order0 = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, b)
        )
        mat, col_order = _reduce_packed(packed, col_order0, m_steps=m)
        reduced_tail = unpack_tail_columns(mat, n, k)
        col_order = jnp.transpose(col_order, (1, 0))
    else:
        h_p = permute_columns(perm, h)
        reduced, col_order = batched_row_reduce(h_p)
        reduced_tail = reduced[:, :, n - k:]
    return _mrb_post(reduced_tail, col_order, n, k)


def _mrb_post(reduced_tail: jnp.ndarray, col_order: jnp.ndarray, n: int,
              k: int):
    """Shared identify_mrb post-processing: MRB re-sort + M matrix."""
    mrb_cols = col_order[:, -k:]  # reliability ranks of MRB positions
    sort_idx = jnp.argsort(mrb_cols, axis=1)
    mrb_sorted = jnp.take_along_axis(mrb_cols, sort_idx, axis=1)
    index_order = jnp.concatenate([col_order[:, : n - k], mrb_sorted], axis=1)
    # MRB column re-sort as a one-hot MXU matmul (0/1 operands are bf16-exact
    # with single-term sums -> exact at any precision); a per-frame
    # take_along_axis over (B, m, k) serializes badly on TPU
    oh_sort = (
        sort_idx[:, None, :] == jnp.arange(k, dtype=sort_idx.dtype)[None, :, None]
    ).astype(jnp.bfloat16)  # (B, k_src, k_pos)
    m_matrix = (
        jnp.einsum(
            "bmj,bjp->bmp",
            reduced_tail.astype(jnp.bfloat16),
            oh_sort,
            preferred_element_type=jnp.float32,
        )
    ).astype(jnp.int8)
    swap_len = jnp.sum((mrb_cols < n - k).astype(jnp.int32), axis=1)
    return {
        "m_matrix": m_matrix,
        "index_order": index_order,
        "swap_len": swap_len,
        "lrb_ranks": col_order[:, : n - k],
    }


def lrb_swap_indicator(lrb_ranks: jnp.ndarray, jump_point: int) -> jnp.ndarray:
    """Indicator of LRB slots whose reliability rank >= jump_point
    (``ordered_statistics_decoding.py:75-76``, jump_point = (n-k) - 4*order)."""
    return (lrb_ranks >= jump_point).astype(jnp.int8)


def reliability_sort(inputs: jnp.ndarray, h: jnp.ndarray):
    """Sort positions by ascending |input| and permute H columns accordingly.

    Port of ``check_matrix_reorder`` (``ordered_statistics_decoding.py:30-41``).

    The column permutation is an MXU one-hot matmul rather than a per-frame
    gather:  ``h_p[b] = h @ P_b`` with ``P_b[j, pos] = (perm[b, pos] == j)``.
    Operands are exactly representable in bf16 and each output entry is a
    0/1 sum with exactly one term, so the result is exact at any matmul
    precision.  Per-frame ``take_along_axis`` gathers serialize badly on TPU
    (measured ~5x slower than the matmul at B=16k on v5e).

    Returns (perm, h_permuted) where perm is (B, n) original-position indices
    in ascending-reliability order and h_permuted is (B, m, n)."""
    perm = jnp.argsort(jnp.abs(inputs), axis=-1, stable=True)
    return perm, permute_columns(perm, h)


def permute_columns(perm: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """(B, n) permutation × static (m, n) H -> (B, m, n) column-permuted H
    via the one-hot MXU matmul (see :func:`reliability_sort`)."""
    n = h.shape[1]
    onehot = (
        perm[:, None, :] == jnp.arange(n, dtype=perm.dtype)[None, :, None]
    ).astype(jnp.bfloat16)  # (B, n_orig, n_pos)
    return (
        jax.lax.dot_general(
            h.astype(jnp.bfloat16),
            onehot,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        .transpose(1, 0, 2)
        .astype(jnp.int8)
    )


def mod2_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """GF(2) matmul via integer-exact f32 MXU matmul + parity."""
    prods = a.astype(jnp.float32) @ b.astype(jnp.float32)
    return (prods - 2.0 * jnp.floor(prods * 0.5)).astype(jnp.int8)
