"""Batched equivalents of the reference's experimental OSD entry points.

``DL_Training_serial/ordered_statistics_decoding.py`` carries several
analysis/search flavors beyond the production path (SURVEY.md §2 stage-3
"superset" row).  They are dead or statistics-only code in the reference,
but belong to its capability surface; this module provides clean batched
versions built on the framework's primitives:

* ``swap_statistics``        — ``stat_pre_osd`` (``:40-59``): histogram of
  GE column-swap counts + the position of the n_S-th swapped column.
* ``updated_mrb_indices``    — ``stat_pro_osd`` (``:61-84``): the original
  positions forming each frame's MRB after elimination.
* ``combination_block``      — ``combination_mrb`` (``:112-126``): 0/1 rows
  of all ``level``-combinations within an MRB index range.
* ``tailored_pattern``       — (``:160-176``): compose a TEP block for one
  order pattern from per-segment combination blocks (cartesian sum).
* ``candidate_matrix``       — the candidate-generation core shared by
  ``execute_osd2`` / stage-3 ``execute_osd`` (``:177-261``): full codeword
  candidates (LRB via the affine map, MRB via TEP xor) for every frame at
  once, MXU mod-2 matmuls instead of per-frame TF loops.
* ``best_estimation_counts`` — ``execute_osd_4`` (``:262-311``): strict
  argmin-candidate == label success/failure counters.

``medium_row_echelon`` (host) mirrors ``medium_gf2elim`` (``:313-345``):
row-echelon reduction *without* column swaps, recording the dependent-column
positions; the reference's copy silently skips elimination on recorded
columns — here the echelon step is completed (documented divergence; the
reference function is only reachable from the statistics path).
"""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import jax.numpy as jnp
import numpy as np

from ..ops import gf2ops
from .engine import PreparedBatch, _discrepancy_terms


def medium_row_echelon(mat: np.ndarray) -> tuple[np.ndarray, list[int]]:
    """Row-echelon form over GF(2) with no column exchanges.

    Returns (reduced matrix, positions of dependent columns — columns that
    provided no pivot among the remaining rows)."""
    m = np.array(mat, dtype=np.uint8) & 1
    rows, cols = m.shape
    dependent: list[int] = []
    i = 0
    for j in range(cols):
        if i >= rows:
            break  # all pivots placed; remaining columns are free, not dependent
        pivots = np.nonzero(m[i:, j])[0]
        if pivots.size == 0:
            dependent.append(j)
            continue
        p = i + pivots[0]
        if p != i:
            m[[i, p]] = m[[p, i]]
        flip = np.outer(m[:, j], m[i])
        flip[i] = 0
        m ^= flip.astype(np.uint8)
        i += 1
    return m, dependent


def swap_statistics(
    updated: jnp.ndarray, h: jnp.ndarray, k: int, n_s: int = 0
) -> tuple[dict, np.ndarray]:
    """Histogram of GE column-swap counts over a batch + per-frame position
    of the ``n_s``-th swapped column (reference ``stat_pre_osd``).

    Uses the batched device elimination (its ``swap_len`` and LRB ranks)
    instead of per-frame host loops."""
    _, h_p = gf2ops.reliability_sort(updated, h)
    info = gf2ops.identify_mrb(h_p, k)
    swap_len = np.asarray(info["swap_len"])
    hist = dict(Counter(swap_len.tolist()))
    nk = h.shape[1] - k
    # per frame: reliability rank of the n_s-th column pulled into the LRB
    # from the nominal MRB side (-1 when fewer than n_s+1 swaps occurred)
    lrb_ranks = np.asarray(info["lrb_ranks"])  # (B, n-k)
    initial_index = np.full(swap_len.shape, -1, np.int64)
    for b in range(lrb_ranks.shape[0]):
        pulled = np.sort(lrb_ranks[b][lrb_ranks[b] >= nk])
        if pulled.size > n_s:
            initial_index[b] = pulled[n_s]
    return hist, initial_index


def updated_mrb_indices(updated: jnp.ndarray, h: jnp.ndarray, k: int) -> np.ndarray:
    """Original (reliability-sorted) positions of each frame's MRB after
    elimination (reference ``stat_pro_osd``)."""
    _, h_p = gf2ops.reliability_sort(updated, h)
    info = gf2ops.identify_mrb(h_p, k)
    return np.asarray(info["index_order"])[:, -k:]


def combination_block(k: int, start: int, end: int, level: int) -> np.ndarray:
    """0/1 matrix of all ``level``-combinations inside [start, end) of a
    k-wide MRB (reference ``combination_mrb``); level 0 -> single zero row."""
    if level == 0:
        return np.zeros((1, k), np.int8)
    rows = []
    for combo in combinations(range(start, end), level):
        row = np.zeros(k, np.int8)
        row[list(combo)] = 1
        rows.append(row)
    return np.stack(rows)


def tailored_pattern(
    direction: list[int], segment_blocks: list[list[np.ndarray]]
) -> np.ndarray:
    """Compose the TEP block of one order pattern from pre-generated
    per-segment combination blocks: the cartesian sum of
    ``segment_blocks[s][direction[s]]`` over segments (reference
    ``tailored_pattern``)."""
    block = segment_blocks[0][direction[0]]
    for s in range(1, len(direction)):
        nxt = segment_blocks[s][direction[s]]
        block = (block[:, None, :] + nxt[None, :, :]).reshape(-1, block.shape[1])
    return block.astype(np.int8)


def candidate_matrix(prep: PreparedBatch, teps: jnp.ndarray, k: int) -> jnp.ndarray:
    """Full codeword candidates for every frame and TEP at once.

    Returns (B, N, n) 0/1: LRB part = mod2(M @ (tep xor mrb0)), MRB part =
    tep xor mrb0 — the batched core of ``execute_osd2`` / stage-3
    ``execute_osd`` without per-frame loops."""
    base_mrb = prep.hard_updated[:, -k:].astype(jnp.float32)  # (B, k)
    tep_f = teps.astype(jnp.float32)  # (N, k)
    mrb_c = jnp.abs(base_mrb[:, None, :] - tep_f[None, :, :])  # (B, N, k) xor
    lrb_c = gf2ops.mod2_matmul(
        prep.m_matrix.astype(jnp.float32), jnp.swapaxes(mrb_c, 1, 2)
    )  # (B, m, N)
    return jnp.concatenate([jnp.swapaxes(lrb_c, 1, 2), mrb_c], axis=2)


def best_estimation_counts(
    prep: PreparedBatch, teps: jnp.ndarray, k: int
) -> tuple[int, int]:
    """Strict argmin-discrepancy success/failure counters (reference
    ``execute_osd_4``): candidates scored by weighted Hamming distance to
    the original-channel hard decision; success iff the argmin candidate
    equals the transmitted codeword."""
    c0, u_l, u_m, _ = _discrepancy_terms(prep, k)
    m_f32 = prep.m_matrix.astype(jnp.float32)
    tep_f = teps.astype(jnp.float32)
    prods = jnp.einsum("bmk,nk->bmn", m_f32, tep_f, preferred_element_type=jnp.float32)
    a = prods - 2.0 * jnp.floor(prods * 0.5)
    disc = c0[:, None] + jnp.einsum("bm,bmn->bn", u_l, a) + u_m @ tep_f.T
    best = jnp.argmin(disc, axis=1)
    cand = candidate_matrix(prep, teps, k)
    sel = jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0]
    ok = jnp.all(sel == prep.order_labels.astype(sel.dtype), axis=1)
    correct = int(jnp.sum(ok.astype(jnp.int32)))
    return correct, int(ok.shape[0]) - correct
