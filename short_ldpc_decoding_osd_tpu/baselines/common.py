"""Shared G-based OSD preprocessing for the FS/PB/conventional baselines.

Unlike the DL-OSD stages (H-based, ascending reliability), the baselines sort
|LLR| *descending*, permute the generator matrix G, and reduce G to a
systematic ``[I | P]`` with both the MRB and LRB position groups re-sorted
ascending by reliability rank (``FS_OSD/fs_testing.py:270-322``:
``swapped_info`` / ``identify_mrb`` / ``full_gf2elim``).  Here the whole
pipeline is batched on device via ``ops.gf2ops.batched_row_reduce``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import gf2ops


@partial(jax.jit, static_argnames=("k",))
def prepare_g_domain(inputs: jnp.ndarray, labels: jnp.ndarray, g: jnp.ndarray, k: int):
    """Batched G-domain OSD preprocessing.

    Args:
      inputs: (B, n) channel LLR proxies.
      labels: (B, n) transmitted bits.
      g: (k, n) generator matrix.

    Returns dict with:
      inputs/labels: (B, n) permuted so positions 0..k-1 are the MRB
        (descending-reliability ranks re-sorted ascending) and k..n-1 the LRB.
      p_matrix: (B, k, n-k) parity part of the per-frame systematic generator
        ``[I | P]``.
    """
    batch, n = inputs.shape
    order = jnp.argsort(-jnp.abs(inputs), axis=-1, stable=True)  # descending
    g_b = jnp.broadcast_to(g[None].astype(jnp.int8), (batch,) + g.shape)
    g_sorted = jnp.take_along_axis(g_b, order[:, None, :], axis=2)
    reduced, col_order = gf2ops.batched_row_reduce(g_sorted)
    mrb_ranks = col_order[:, :k]
    lrb_ranks = col_order[:, k:]
    ms = jnp.argsort(mrb_ranks, axis=1)
    ls = jnp.argsort(lrb_ranks, axis=1)
    # P rows follow the MRB re-sort (row i of [I|P] owns pivot column i),
    # P columns follow the LRB re-sort.
    p = reduced[:, :, k:]
    p = jnp.take_along_axis(p, ms[:, :, None], axis=1)
    p = jnp.take_along_axis(p, ls[:, None, :], axis=2)
    index_order = jnp.concatenate(
        [jnp.sort(mrb_ranks, axis=1), jnp.sort(lrb_ranks, axis=1)], axis=1
    )
    full_perm = jnp.take_along_axis(order, index_order, axis=1)
    out_inputs = jnp.take_along_axis(inputs, full_perm, axis=1)
    out_labels = jnp.take_along_axis(labels.astype(jnp.int8), full_perm, axis=1)
    return {"inputs": out_inputs, "labels": out_labels, "p_matrix": p}


def candidate_distance_terms(prep: dict, k: int):
    """Affine decomposition of weighted/unweighted candidate distances.

    For TEP e (over the MRB), the candidate codeword is
    ``[mrb0 ^ e | (mrb0 ^ e) @ P]``; with hard decisions hd and magnitudes w
    the distances decompose as (x^y = x+y-2xy):

      wd(e) = c_w + uw_m . e + uw_l . mod2(e @ P)
      hd(e) = c_h + uh_m . e + uh_l . mod2(e @ P)

    Returns the constants/vectors plus base quantities."""
    inputs = prep["inputs"]
    hard = (inputs <= 0).astype(jnp.float32)
    mag = jnp.abs(inputs)
    ones = jnp.ones_like(mag)
    p = prep["p_matrix"].astype(jnp.float32)
    mrb0 = hard[:, :k]
    lrb0 = gf2ops.mod2_matmul(mrb0[:, None, :], p)[:, 0].astype(jnp.float32)
    # distance of the zero-TEP candidate on LRB: d0 = lrb0 ^ hard_lrb
    d0 = lrb0 + hard[:, k:] - 2.0 * lrb0 * hard[:, k:]

    def terms(weight):
        w_m, w_l = weight[:, :k], weight[:, k:]
        c = jnp.sum(w_l * d0, axis=1)  # MRB part of zero-TEP distance is 0
        u_m = w_m  # mrb distance bits equal e directly (cand mrb ^ hard mrb = e)
        u_l = w_l * (1.0 - 2.0 * d0)
        return c, u_m, u_l

    c_w, uw_m, uw_l = terms(mag)
    c_h, uh_m, uh_l = terms(ones)
    return {
        "hard": hard,
        "mag": mag,
        "mrb0": mrb0,
        "lrb0": lrb0,
        "d0": d0,
        "c_w": c_w,
        "uw_m": uw_m,
        "uw_l": uw_l,
        "c_h": c_h,
        "uh_m": uh_m,
        "uh_l": uh_l,
    }


def tep_distances(terms: dict, teps: jnp.ndarray, p_matrix: jnp.ndarray):
    """(weighted, unweighted, lrb_flip_parity) distances for a TEP matrix.

    teps: (N, k) static 0/1; p_matrix: (B, k, n-k).
    Returns wd (B, N), hd (B, N) and a(B, N, n-k)? — no, the LRB flip matrix
    is reduced immediately; only distances are materialized."""
    # Precision.HIGHEST on every distance-bearing contraction: on TPU the
    # default f32 matmul truncates operands to bf16 (~1e-3 relative), which
    # flips float-tie stop decisions vs the reference's exact-f32 CPU math
    # (the same fix the production walk needed, docs/REFPARITY.md §6).
    # Measured cost at baseline scale: nil.
    hi = jax.lax.Precision.HIGHEST
    tep_f = teps.astype(jnp.float32)
    prods = jnp.einsum(
        "bkl,nk->bnl", p_matrix.astype(jnp.float32), tep_f,
        preferred_element_type=jnp.float32, precision=hi,
    )  # (B, N, n-k) = e @ P
    a = prods - 2.0 * jnp.floor(prods * 0.5)
    wd = terms["c_w"][:, None] + jnp.matmul(
        terms["uw_m"], tep_f.T, precision=hi
    ) + jnp.einsum("bl,bnl->bn", terms["uw_l"], a, precision=hi)
    hd = terms["c_h"][:, None] + jnp.matmul(
        terms["uh_m"], tep_f.T, precision=hi
    ) + jnp.einsum("bl,bnl->bn", terms["uh_l"], a, precision=hi)
    return wd, hd, a
