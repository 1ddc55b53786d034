"""Batched OSD engine: reorder -> GF(2) elimination -> TEP walk -> stopper.

TPU-first redesign of ``DL_OSD_Testing_serial/ordered_statistics_decoding.py``:
the per-frame Python loops become batched tensor programs.

* Permutation dance (|LLR| sort, GE column swaps, MRB re-sort) is the batched
  ``ops.gf2ops`` pipeline (bit-exact vs the reference host algorithm, see
  tests/test_gf2ops.py).
* Candidate re-encoding ``lrb = M @ (tep ^ mrb0)`` and the weighted-Hamming
  discrepancy are folded into MXU matmuls:  with ``x ^ y = x + y - 2xy`` the
  discrepancy of every TEP in a block reduces to an affine map
  ``c + u_l @ mod2(M @ T^T) + u_m @ T^T`` — no per-TEP gathers.
* The sliding-window early stop (``sliding_osd``, ``:164-220``) is replayed
  as a short ``lax.scan`` over block indices (<= 30 steps) on the [B, P]
  block-minima matrix, reproducing the serial walk's decisions (window
  contents, skip rule, stop probability threshold) for every frame in
  parallel.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gf2ops

# numpy scalar, NOT jnp: a module-level jnp scalar materializes a device
# array at import, which initializes the XLA backend and breaks
# jax.distributed.initialize() for any process that imports this package
# before joining the cluster (found by the real 2-process test)
_BIG = np.float32(3.4e38)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreparedBatch:
    """Per-frame quantities in the final (reliability + GE) column order."""

    order_updated: jnp.ndarray  # (B, n) DIA-refined / last-iteration inputs
    order_original: jnp.ndarray  # (B, n) channel-iteration inputs
    order_labels: jnp.ndarray  # (B, n) int8 transmitted bits
    m_matrix: jnp.ndarray  # (B, m, k)
    swap_len: jnp.ndarray  # (B,)
    lrb_ranks: jnp.ndarray  # (B, n-k)
    hard_original: jnp.ndarray  # (B, n) 0/1 from original channel
    hard_updated: jnp.ndarray  # (B, n) 0/1 from updated metric
    mag_original: jnp.ndarray  # (B, n) |original|
    truth_discrepancy: jnp.ndarray  # (B,) weighted dist of label vs hard_original


def prepare(updated, original, labels, h, k: int) -> PreparedBatch:
    """Sort by |updated| ascending, run GE, apply the final index order.

    Mirrors ``check_matrix_reorder`` + ``identify_mrb`` + the gathers in
    ``sliding_osd`` (``ordered_statistics_decoding.py:169-185``).  The
    permuted H is never materialized densely on TPU — GE runs on the
    MXU-packed tensor (``gf2ops.identify_mrb_from_perm``)."""
    # Reliability sort + gather of the per-bit vectors in ONE stable co-sort
    # (exact, and avoids a (B, n, n) one-hot pass; jnp.argsort(stable=True)
    # is lax.sort with an iota tiebreak, so the carried operands land in
    # exactly argsort order).
    n = updated.shape[1]
    iota = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :], updated.shape
    )
    _, perm, u_s, o_s, l_f = jax.lax.sort(
        (jnp.abs(updated), iota, updated, original,
         labels.astype(jnp.float32)),
        dimension=1, num_keys=1, is_stable=True,
    )
    mrb_info = gf2ops.identify_mrb_from_perm(perm, h, k)
    index_order = mrb_info["index_order"]
    # Second gather (by the GE-dependent index_order): z[p] = y[io[p]] via
    # two exact sorts (keys are permutations, so ranks are unique): sort
    # (io, iota) -> inv_io with io[inv_io[r]] = r... i.e. inv_io[j] is the
    # output slot of source j; then sorting the values by inv_io delivers
    # them to their slots.  Replaces a (B, n, n) one-hot matmul pass.
    _, inv_io = jax.lax.sort(
        (index_order.astype(jnp.int32), iota), dimension=1, num_keys=1
    )
    _, order_updated, order_original, l_o = jax.lax.sort(
        (inv_io, u_s, o_s, l_f), dimension=1, num_keys=1
    )
    order_labels = l_o.astype(jnp.int8)
    hard_original = (order_original <= 0).astype(jnp.int8)
    hard_updated = (order_updated <= 0).astype(jnp.int8)
    mag_original = jnp.abs(order_original)
    truth = jnp.sum(
        ((order_labels ^ hard_original).astype(jnp.float32)) * mag_original, axis=1
    )
    return PreparedBatch(
        order_updated=order_updated,
        order_original=order_original,
        order_labels=order_labels,
        m_matrix=mrb_info["m_matrix"],
        swap_len=mrb_info["swap_len"],
        lrb_ranks=mrb_info["lrb_ranks"],
        hard_original=hard_original,
        hard_updated=hard_updated,
        mag_original=mag_original,
        truth_discrepancy=truth,
    )


def _discrepancy_terms(prep: PreparedBatch, k: int):
    """Constants/vectors of the affine TEP-discrepancy map (see module doc)."""
    n = prep.hard_original.shape[1]
    m = n - k
    h_l = prep.hard_original[:, :m].astype(jnp.float32)
    h_m = prep.hard_original[:, m:].astype(jnp.float32)
    w_l = prep.mag_original[:, :m]
    w_m = prep.mag_original[:, m:]
    base_mrb = prep.hard_updated[:, m:].astype(jnp.float32)  # (B, k)
    # v = M @ base_mrb (the base LRB estimate), e = v ^ h_l
    v = gf2ops.mod2_matmul(prep.m_matrix.astype(jnp.float32), base_mrb[..., None])[
        ..., 0
    ].astype(jnp.float32)
    e = v + h_l - 2.0 * v * h_l
    f = base_mrb + h_m - 2.0 * base_mrb * h_m  # (tep=0 mrb xor) vs original
    c0 = jnp.sum(w_l * e, axis=1) + jnp.sum(w_m * f, axis=1)  # (B,)
    u_l = w_l * (1.0 - 2.0 * e)  # (B, m)
    u_m = w_m * (1.0 - 2.0 * f)  # (B, k)
    return c0, u_l, u_m, base_mrb


@partial(jax.jit, static_argnames=("k", "bounds", "use_kernel"))
def block_discrepancy_minima(prep: PreparedBatch, teps: jnp.ndarray,
                             mask: jnp.ndarray, k: int,
                             bounds: tuple | None = None,
                             use_kernel: bool | None = None):
    """Per-block minima of the weighted discrepancy over all TEPs.

    Args:
      prep: prepared batch.
      teps: (P, Nmax, k) padded TEP blocks (0/1), or — when ``bounds`` is
        given — (C, chunk, k) dense chunks from ``segments.pack_tep_chunks``
        (~4.5x less device work for the learned path; identical minima up
        to float reduction order — the chunked path computes the
        discrepancies by a different but mathematically equal association,
        so near-tie argmins can differ at ~1e-6 relative).
      mask: (P, Nmax) validity (or (C, chunk)).
      bounds: static per-block (start, stop) flat indices for chunked mode.
      use_kernel: chunked mode's fused-Pallas switch (None = on TPU).

    Returns:
      minima: (B, P) min weighted discrepancy per block.
      argmins: (B, P) int32 index of the minimizing TEP inside each block.
    """
    if bounds is None:
        # reduce inside the scan: (P, B, Nmax) never materializes
        def reduce_block(disc):
            return (jnp.min(disc, axis=1),
                    jnp.argmin(disc, axis=1).astype(jnp.int32))

        minima, argmins = _block_disc_scan(prep, teps, mask, k, reduce_block)
        return jnp.transpose(minima), jnp.transpose(argmins)
    flat = _disc_flat_chunked(prep, teps, mask, k, use_kernel)  # (B, C*chunk)
    b = flat.shape[0]
    big = jnp.full((b,), _BIG, flat.dtype)
    zero = jnp.zeros((b,), jnp.int32)
    # empty blocks (impossible per-segment weights) mirror the padded
    # path's all-masked result: min = _BIG, argmin = 0
    minima = jnp.stack(
        [big if e == s else jnp.min(flat[:, s:e], axis=1) for s, e in bounds],
        1,
    )
    argmins = jnp.stack(
        [zero if e == s else jnp.argmin(flat[:, s:e], axis=1).astype(jnp.int32)
         for s, e in bounds],
        1,
    )
    return minima, argmins


def _disc_flat_chunked(prep: PreparedBatch, teps, mask, k: int,
                       use_kernel: bool | None = None):
    """(B, C*chunk) masked discrepancies for the dense-chunked TEP layout.

    With ``use_kernel`` (default: on TPU) the ``u_l``-weighted parity term
    runs as the fused Pallas kernel (``ops/osd_disc_pallas.py``): the XLA
    chunk scan keeps only a (B, m, chunk) parity intermediate per step but
    serializes the chunks; the kernel keeps the intermediate in VMEM and
    the grid parallel (fused dl_osd_step 6.53 -> 6.04 ms / 4096, r4).
    Identical math; float reduction order differs (~1e-6 relative).
    Otherwise the per-chunk scan serves (bounded peak memory on any
    backend; a one-shot (B, m, C*chunk) einsum would blow up on a long
    user-configured decoding path).  ``use_kernel`` is a TRACE-TIME choice;
    the host-level compile-failure demotion lives in ``make_dl_osd_step``
    (a Mosaic VMEM failure surfaces at outer-jit compile, outside any
    in-graph try)."""
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    if not use_kernel:
        disc = _block_disc_scan(prep, teps, mask, k, None)  # (C, B, chunk)
        return jnp.transpose(disc, (1, 0, 2)).reshape(disc.shape[1], -1)
    from ..ops import osd_disc_pallas as odp

    c0, u_l, u_m, _ = _discrepancy_terms(prep, k)
    c, chunk, kk = teps.shape
    t_flat = teps.reshape(c * chunk, kk)
    lterm = odp.lterm_pallas(prep.m_matrix, u_l, t_flat)
    disc = (
        c0[:, None]
        + lterm
        + jnp.matmul(u_m, t_flat.T.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    )
    return jnp.where(mask.reshape(-1)[None, :], disc, _BIG)


def _block_disc_scan(prep: PreparedBatch, teps, mask, k: int, post=None):
    """Scan over TEP blocks/chunks -> per-block ``post(disc)`` (or masked
    discrepancies (P, B, Nmax) when ``post`` is None)."""
    c0, u_l, u_m, _ = _discrepancy_terms(prep, k)
    # 0/1 operands in bf16 (exact) with f32 accumulation: products are 0/1
    # and row sums are <= k < 2^24, so the parity matmul is bit-exact at the
    # MXU's native bf16 rate (~4x the f32 path; this einsum dominates the
    # block scan's FLOPs: B*m*Nmax*k*2 per block)
    m_bf = prep.m_matrix.astype(jnp.bfloat16)

    def block_fn(_, blk):
        tep, valid = blk  # (Nmax, k), (Nmax,)
        tep_f = tep.astype(jnp.float32)
        # A[b, :, N] = mod2(M_b @ T^T): parity flips the TEP induces on LRB
        prods = jnp.einsum(
            "bmk,nk->bmn", m_bf, tep.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        a = prods - 2.0 * jnp.floor(prods * 0.5)
        # the WEIGHTED contractions run full-f32: the default TPU matmul
        # truncates operands to bf16 (~1e-3 relative noise on the
        # discrepancy), enough to flip success-proxy/stopper-margin ties vs
        # the reference's f32 sums (walk-parity frames 264/269/496, r4);
        # these are k-times smaller than the parity einsum above, so the
        # cost is negligible
        disc = (
            c0[:, None]
            + jnp.einsum("bm,bmn->bn", u_l, a,
                         precision=jax.lax.Precision.HIGHEST)
            + jnp.matmul(u_m, tep_f.T, precision=jax.lax.Precision.HIGHEST)
        )
        disc = jnp.where(valid[None, :], disc, _BIG)
        return None, disc if post is None else post(disc)

    _, out = jax.lax.scan(block_fn, None, (teps, mask))
    return out


def stopper_apply(fcn_params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Sliding-window stopper FCN: Dense(w+1 linear) -> Dense(2 softmax),
    no biases (``nn_net.py:136-148``).  Full-f32 matmuls: bf16 operand
    truncation puts ~1e-3 noise on P[stop], enough to flip near-margin
    stops vs the reference's f32 walk (tiny (w+1)-wide contractions)."""
    hi = jax.lax.Precision.HIGHEST
    hidden = jnp.matmul(x, fcn_params["w1"], precision=hi)
    return jax.nn.softmax(
        jnp.matmul(hidden, fcn_params["w2"], precision=hi), axis=-1
    )


@partial(jax.jit, static_argnames=("window", "soft_margin"))
def sliding_walk(
    block_minima: jnp.ndarray,
    fcn_params: dict,
    window: int = 5,
    soft_margin: float = 0.9,
):
    """Replay the serial sliding-window walk — fully vectorized.

    The serial state is positional in disguise: the window at step kk is
    always ``blocks[kk:kk+window]`` (it only freezes after the outputs are
    already determined), and the running global min is a PREFIX MIN — a
    skipped step has ``new_block > gmin`` so ``min(gmin, new_block)`` would
    not have changed it anyway.  Hence: one batched FCN matmul over all
    windows, a cummin for the skip rule, and first-true reductions — no
    scan.  Bit-exact vs the reference scan replay
    (``_sliding_walk_scan``, kept as the test oracle).

    Semantics of ``sliding_osd``'s loop (``:191-219``): the window holds the
    last ``window`` block minima; at step kk (0-based), if kk > 0 and the new
    block's minimum exceeds the current global minimum the stopper is skipped;
    otherwise the sorted window + position index feeds the FCN and decoding
    stops when P[stop] > soft_margin.  Returns for every frame:

      stop_k: (B,) index kk at which the walk stopped (or last step),
      deep_limit: (B,) number of blocks actually expanded (kk + window),
      global_min: (B,) the running minimum at the stop point,
      windows_evaluated: (B,) count of FCN evaluations.
    """
    batch, num_blocks = block_minima.shape
    steps = num_blocks - window + 1
    if steps < 1:
        # the scan replay "completed" here but indexed acc[] out of range
        # downstream (silently wrong complexity); fail loudly instead
        raise ValueError(
            f"decoding path has {num_blocks} blocks < window {window}; "
            "shorten the window or lengthen the path"
        )
    # (B, steps, window) sliding view via static gather indices
    idx = np.arange(steps)[:, None] + np.arange(window)[None, :]
    wins = block_minima[:, idx]  # (B, steps, window)
    sorted_wins = jnp.sort(wins, axis=2)
    kks = jnp.arange(steps, dtype=jnp.float32)
    feats = jnp.concatenate(
        [sorted_wins, jnp.broadcast_to(kks[None, :, None], (batch, steps, 1))],
        axis=2,
    )
    probs = stopper_apply(fcn_params, feats.reshape(batch * steps, window + 1))
    fire = probs[:, 1].reshape(batch, steps) > soft_margin

    cmin = jax.lax.cummin(block_minima, axis=1)  # prefix minima
    # skip(kk>0) = blocks[window-1+kk] > gmin_after_step_{kk-1}
    #            = blocks[window-1+kk] > cmin[window+kk-2]
    new_blocks = block_minima[:, window:]  # kk = 1..steps-1
    skip_tail = new_blocks > cmin[:, window - 1:-1]
    skip = jnp.concatenate(
        [jnp.zeros((batch, 1), bool), skip_tail], axis=1
    )  # (B, steps)

    cand = jnp.logical_and(jnp.logical_not(skip), fire)
    any_fire = jnp.any(cand, axis=1)
    first = jnp.argmax(cand, axis=1).astype(jnp.int32)
    stop_k = jnp.where(any_fire, first, jnp.int32(steps - 1))
    deep_limit = stop_k + window
    evals = jnp.take_along_axis(
        jnp.cumsum(jnp.logical_not(skip).astype(jnp.int32), axis=1),
        stop_k[:, None], axis=1,
    )[:, 0]
    gmin = jnp.take_along_axis(cmin, (deep_limit - 1)[:, None], axis=1)[:, 0]
    return {
        "stop_k": stop_k,
        "deep_limit": deep_limit,
        "global_min": gmin,
        "windows_evaluated": evals,
        "window_num": stop_k + 1,
    }


@partial(jax.jit, static_argnames=("window", "soft_margin"))
def _sliding_walk_scan(
    block_minima: jnp.ndarray,
    fcn_params: dict,
    window: int = 5,
    soft_margin: float = 0.9,
):
    """Reference scan replay of the serial walk (test oracle for
    :func:`sliding_walk`).

    Semantics of ``sliding_osd``'s loop (``:191-219``): the window holds the
    last ``window`` block minima; at step kk (0-based), if kk > 0 and the new
    block's minimum exceeds the current global minimum the stopper is skipped;
    otherwise the sorted window + position index feeds the FCN and decoding
    stops when P[stop] > soft_margin.  Returns for every frame:

      stop_k: (B,) index kk at which the walk stopped (or last step),
      deep_limit: (B,) number of blocks actually expanded (kk + window),
      global_min: (B,) the running minimum at the stop point (min over the
        first ``deep_limit`` blocks that passed through evaluated windows —
        exactly the serial variable's final value),
      windows_evaluated: (B,) count of FCN evaluations (reference's
        ``window_num`` bookkeeping is deep_limit - window + 1; both returned).
    """
    batch, num_blocks = block_minima.shape
    steps = num_blocks - window + 1
    pos = jnp.arange(batch)

    init_window = block_minima[:, :window]  # (B, window)
    init_global = jnp.min(init_window, axis=1)

    def step_fn(carry, kk):
        win, gmin, stopped, stop_k, evals = carry
        new_block = block_minima[:, window - 1 + kk]  # only valid for kk>0 path
        win_shifted = jnp.concatenate([win[:, 1:], new_block[:, None]], axis=1)
        win_cur = jnp.where(kk == 0, win, win_shifted)
        skip = jnp.logical_and(kk > 0, new_block > gmin)
        sorted_win = jnp.sort(win_cur, axis=1)
        feats = jnp.concatenate(
            [sorted_win, jnp.full((batch, 1), 1.0) * kk.astype(jnp.float32)], axis=1
        )
        probs = stopper_apply(fcn_params, feats)
        fire = probs[:, 1] > soft_margin
        evaluate = jnp.logical_and(jnp.logical_not(stopped), jnp.logical_not(skip))
        new_gmin = jnp.where(evaluate, jnp.minimum(gmin, jnp.min(win_cur, axis=1)), gmin)
        newly_stopped = jnp.logical_and(evaluate, fire)
        stop_k = jnp.where(jnp.logical_and(newly_stopped, stop_k < 0), kk, stop_k)
        # the serial loop's deep_limit advances even on skipped steps
        advance = jnp.logical_not(stopped)
        evals = evals + evaluate.astype(jnp.int32)
        stopped = jnp.logical_or(stopped, newly_stopped)
        return (jnp.where(advance[:, None], win_cur, win), new_gmin, stopped, stop_k, evals), advance

    carry0 = (
        init_window,
        init_global,
        jnp.zeros(batch, bool),
        jnp.full(batch, -1, jnp.int32),
        jnp.zeros(batch, jnp.int32),
    )
    (win, gmin, stopped, stop_k, evals), advanced = jax.lax.scan(
        step_fn, carry0, jnp.arange(steps)
    )
    # frames that never fired walk to the last step
    last_k = jnp.sum(advanced.astype(jnp.int32), axis=0) - 1
    stop_k = jnp.where(stop_k >= 0, stop_k, last_k.astype(jnp.int32))
    deep_limit = stop_k + window
    del pos
    return {
        "stop_k": stop_k,
        "deep_limit": deep_limit,
        "global_min": gmin,
        "windows_evaluated": evals,
        "window_num": stop_k + 1,
    }


@partial(jax.jit, static_argnames=("k", "threshold_sum", "prune"))
def pruned_batch_osd(
    prep: PreparedBatch,
    teps_all: jnp.ndarray,
    k: int,
    threshold_sum: int = 3,
    prune: bool = True,
):
    """Alternative batch OSD with LRB-divergence candidate pruning.

    Port of ``execute_osd`` + ``best_estimating``
    (``DL_OSD_Testing_serial/ordered_statistics_decoding.py:259-308,121-139``):
    every TEP in ``teps_all`` (N, k) is scored at once; when ``prune`` is on,
    TEPs whose estimated-LRB flips on the "swap-focus" positions (reliability
    rank >= jump_point = (n-k) - 4*threshold_sum) exceed 2*threshold_sum are
    excluded from the argmin (they are low-probability candidates).  Success
    is the strict criterion: the argmin candidate equals the transmitted
    codeword."""
    c0, u_l, u_m, base_mrb = _discrepancy_terms(prep, k)
    n = prep.hard_original.shape[1]
    m = n - k
    m_f32 = prep.m_matrix.astype(jnp.float32)
    tep_f = teps_all.astype(jnp.float32)
    # estimated LRB flips vs the TEP-0 baseline
    prods = jnp.einsum("bmk,nk->bmn", m_f32, tep_f, preferred_element_type=jnp.float32)
    a = prods - 2.0 * jnp.floor(prods * 0.5)  # (B, m, N)
    # weighted contractions full-f32 (see _block_disc_scan)
    disc = (
        c0[:, None]
        + jnp.einsum("bm,bmn->bn", u_l, a,
                     precision=jax.lax.Precision.HIGHEST)
        + jnp.matmul(u_m, tep_f.T, precision=jax.lax.Precision.HIGHEST)
    )
    if prune:
        # divergence of estimated LRB vs the *updated* hard LRB on focus slots
        jump_point = m - 4 * threshold_sum
        focus = (prep.lrb_ranks >= jump_point).astype(jnp.float32)  # (B, m)
        init_lrb = prep.hard_updated[:, :m].astype(jnp.float32)
        v = gf2ops.mod2_matmul(m_f32, base_mrb[..., None])[..., 0].astype(jnp.float32)
        e0 = v + init_lrb - 2.0 * v * init_lrb  # baseline flip vs updated hard
        # per-TEP focus-position flips: sum focus * (a xor e0)
        base_term = jnp.sum(focus * e0, axis=1)
        div = base_term[:, None] + jnp.einsum("bm,bmn->bn", focus * (1.0 - 2.0 * e0), a)
        keep = div <= 2.0 * threshold_sum
        # reference quirk: if fewer than 2 survive, fall back to the first 4
        too_few = jnp.sum(keep.astype(jnp.int32), axis=1) < 2
        first4 = jnp.arange(teps_all.shape[0]) < 4
        keep = jnp.where(too_few[:, None], first4[None, :], keep)
        disc = jnp.where(keep, disc, _BIG)
        candidates_counted = jnp.sum(keep.astype(jnp.int32), axis=1)
    else:
        candidates_counted = jnp.full(disc.shape[0], teps_all.shape[0], jnp.int32)
    best = jnp.argmin(disc, axis=1)
    tep_sel = tep_f[best]  # (B, k)
    mrb_c = jnp.abs(base_mrb - tep_sel)
    prods_sel = jnp.einsum("bmk,bk->bm", m_f32, tep_sel)
    a_sel = prods_sel - 2.0 * jnp.floor(prods_sel * 0.5)
    v = gf2ops.mod2_matmul(m_f32, base_mrb[..., None])[..., 0].astype(jnp.float32)
    lrb_c = jnp.abs(v - a_sel)
    cand = jnp.concatenate([lrb_c, mrb_c], axis=1)
    success = jnp.all(
        cand == prep.order_labels.astype(jnp.float32), axis=1
    )
    return {
        "success": success,
        "best_index": best,
        "num_candidates": candidates_counted,
        "min_discrepancy": jnp.min(disc, axis=1),
    }


def sliding_osd(
    prep: PreparedBatch,
    teps: jnp.ndarray,
    mask: jnp.ndarray,
    acc_block_sizes: np.ndarray,
    fcn_params: dict,
    k: int,
    window: int = 5,
    soft_margin: float = 0.9,
    rel_tol: float = 1e-3,
    bounds: tuple | None = None,
    use_kernel: bool | None = None,
):
    """Full batched DL-OSD evaluation of one failure batch.

    Returns per-frame success flags (the reference's oracle proxy
    ``global_min == truth_discrepancy``, here with a relative tolerance since
    the two sums are computed by different — but mathematically equal —
    reductions), TEP-complexity and window counts.

    With ``bounds`` (static, from ``segments.pack_tep_chunks``), ``teps`` /
    ``mask`` are the dense chunked layout — same outputs up to float
    reduction order (see ``block_discrepancy_minima``) for ~4.5x less
    TEP-scan work on the learned path.
    """
    minima, argmins = block_discrepancy_minima(prep, teps, mask, k,
                                               bounds=bounds,
                                               use_kernel=use_kernel)
    walk = sliding_walk(minima, fcn_params, window=window, soft_margin=soft_margin)
    acc = jnp.asarray(acc_block_sizes, jnp.int32)
    complexity = acc[walk["deep_limit"]]
    scale = jnp.maximum(prep.truth_discrepancy, 1.0)
    success = jnp.abs(walk["global_min"] - prep.truth_discrepancy) <= rel_tol * scale

    # strict success: the argmin candidate within the expanded blocks equals
    # the transmitted codeword (robust to float reduction-order noise)
    num_blocks = minima.shape[1]
    blk_ids = jnp.arange(num_blocks)[None, :]
    in_walk = blk_ids < walk["deep_limit"][:, None]
    masked_minima = jnp.where(in_walk, minima, _BIG)
    best_block = jnp.argmin(masked_minima, axis=1)  # (B,)
    best_inner = jnp.take_along_axis(argmins, best_block[:, None], axis=1)[:, 0]
    if bounds is None:
        tep_sel = teps[best_block, best_inner].astype(jnp.float32)  # (B, k)
    else:
        starts = jnp.asarray([s for s, _ in bounds], jnp.int32)
        flat_teps = teps.reshape(-1, teps.shape[-1])
        tep_sel = flat_teps[starts[best_block] + best_inner].astype(jnp.float32)
    base_mrb = prep.hard_updated[:, -k:].astype(jnp.float32)
    mrb_c = jnp.abs(base_mrb - tep_sel)
    m_f32 = prep.m_matrix.astype(jnp.float32)
    prods = jnp.einsum("bmk,bk->bm", m_f32, mrb_c)
    lrb_c = prods - 2.0 * jnp.floor(prods * 0.5)
    cand = jnp.concatenate([lrb_c, mrb_c], axis=1)
    strict_success = jnp.all(cand == prep.order_labels.astype(jnp.float32), axis=1)
    return {
        "success": success,
        "strict_success": strict_success,
        "complexity": complexity,
        "window_num": walk["window_num"],
        "windows_evaluated": walk["windows_evaluated"],
        "global_min": walk["global_min"],
        "deep_limit": walk["deep_limit"],
        "block_minima": minima,
    }


def make_dl_osd_step(model, h, k: int, window: int = 5,
                     soft_margin: float = 0.9, bounds: tuple | None = None):
    """One fully-jitted DIA-OSD evaluation step: refine -> prepare ->
    sliding_osd as a single XLA program (no intermediate HBM round trips or
    per-call dispatch; ~2x end-to-end on v5e vs the chained calls).

    ``model`` is any DIA module exposing ``refine_fast`` (for the linear
    ``ConvBitwise`` this is the composed one-tap-filter form).  Returns
    ``step(dia_params, traj, labels, teps, mask, acc, fcn_params)`` ->
    (sliding_osd outputs, refined).

    Per the repo-wide fused-kernel policy (mc/ladder.py): the fused
    TEP-discrepancy Pallas rung is guarded at the HOST level — a Mosaic
    lowering/VMEM failure (which surfaces at outer-jit compile, outside
    any in-graph try) demotes permanently to the chunk-scan path instead
    of killing the eval sweep; programming errors still raise."""
    h = jnp.asarray(h)

    def build(use_kernel):
        @jax.jit
        def step(dia_params, traj, labels, teps, mask, acc, fcn_params):
            refined = model.refine_fast(dia_params, traj)
            prep = prepare(refined, traj[:, 0], labels, h, k)
            out = sliding_osd(
                prep, teps, mask, acc, fcn_params, k,
                window=window, soft_margin=soft_margin, bounds=bounds,
                use_kernel=use_kernel,
            )
            return out, refined

        return step

    fast = build(None)  # backend default: Pallas kernel on TPU
    state = {"demoted": False, "slow": None}

    def run(*args):
        if not state["demoted"]:
            from ..mc.harness import _attempt_fused

            status, val = _attempt_fused(
                lambda: fast(*args), "fused DL-OSD step"
            )
            if status == "ok":
                return val
            state["demoted"] = True  # permanent, like the MC ladder
        if state["slow"] is None:
            state["slow"] = build(False)
        return state["slow"](*args)

    return run


def make_dl_osd_step_from_llr(model, code, variant: str, num_iterations: int,
                              window: int = 5, soft_margin: float = 0.9,
                              bounds: tuple | None = None,
                              decoder: str = "auto",
                              with_iteration_stats: bool = False):
    """Fused phase-2 step consuming RAW failure LLRs: the (T+1)-iteration
    trajectory re-decode, DIA refinement, OSD preparation and the sliding
    walk run as ONE XLA program — the failure hand-off between phases stays
    on device (SURVEY.md §7 decision 6), replacing the reference's
    stage-5 -> stage-6 TFRecord file hop (``ms_test.py:245-272`` ->
    ``nn_testing.py:159-256``).  vs ``make_dl_osd_step`` this removes the
    (N, T+1, n) trajectory round-trip through the host (~1.3 GB per 200k
    failures over the axon tunnel).

    Returns ``step(nms_params, dia_params, llr, labels, teps, mask, acc,
    fcn_params) -> (outputs, refined, detected)`` where ``detected`` is the
    per-frame detected-failure flag of the bit-exact re-decode
    (``nms.frame_stats``'s rule) — rows the capture kernel flagged that the
    re-decode does not confirm carry ``detected=False`` and should be
    excluded from OSD accounting by the caller (the one-sided mismatch
    accounting documented on ``mc.harness.FailureBatch``).

    ``decoder``: "xla" re-derives trajectories with the bit-exact XLA
    decoder (the parity anchor, ~32 ms/4096 on v5e — the (B, m, n) message
    tensor round-trips HBM every iteration); "edge" uses the VMEM
    trajectory kernel (``nms_edge_pallas.decode_traj_edge``, full-f32
    "highest" mode, ~3e-5 vs XLA after 12 iterations; measured r5: the
    full phase-2 chunk drops 39.7 -> 8.4 ms with end-to-end OSD decisions
    identical on 4096 random frames); "edge_xla" uses the edge-layout
    pure-XLA decoder (``nms_edge_xla.decode_edge_xla``, HIGHEST matmuls,
    ~1e-6 vs dense — the large-code rung, no VMEM precondition); "auto"
    picks "edge" on TPU when the edge layout fits and the variant is
    scalar-normalized, "edge_xla" when it does not fit."""
    from ..ops import nms

    decode_h = code.extended().h if variant == "ENMS" else code.h
    h_dec = jnp.asarray(decode_h, jnp.float32)
    h_osd = jnp.asarray(code.h_osd)
    edge_cols = (
        jnp.asarray(nms.edge_columns(decode_h)) if variant == "NMS-r" else None
    )
    k = code.k
    decode_h_host = np.asarray(decode_h)
    if decoder == "auto":
        from ..ops.nms_edge_pallas import auto_block_frames as edge_auto
        from ..ops.nms_edge_xla import auto_select as edge_xla_auto

        dc = int(decode_h_host.sum(axis=1).max())
        fits = edge_auto(decode_h_host.shape[0], code.n, dc) >= 8
        if (
            jax.default_backend() == "tpu"
            and variant != "NMS-r"
            and fits
        ):
            decoder = "edge"
        elif edge_xla_auto(decode_h_host, variant):
            # above the VMEM envelope (e.g. WiMAX (1056, 880)) or NMS-r
            # (no VMEM kernel for the neural update): the edge-layout
            # pure-XLA rung, full-f32 HIGHEST matmuls (the trajectory
            # feeds the DIA, where bf16 truncation broke walk parity in
            # r4 — see ops/nms_edge_xla.py)
            decoder = "edge_xla"
        else:
            decoder = "xla"

    def build(use_kernel):
        @jax.jit
        def step(nms_params, dia_params, llr, labels, teps, mask, acc,
                 fcn_params):
            block = 256
            while block >= 8 and llr.shape[0] % block:
                block //= 2
            if decoder == "edge" and block >= 8:
                from ..ops.nms_edge_pallas import decode_traj_edge

                outs = decode_traj_edge(
                    nms_params, decode_h_host, llr, num_iterations, variant,
                    block_frames=block, mode="highest",
                )
            elif decoder == "edge_xla":
                from ..ops.nms_edge_xla import decode_edge_xla

                outs = decode_edge_xla(
                    nms_params, decode_h_host, llr, num_iterations, variant,
                    mode="highest",
                )
            else:
                outs = nms.decode(
                    nms_params, h_dec, llr, num_iterations, variant, edge_cols
                )
            traj = jnp.transpose(outs, (1, 0, 2))  # (B, T+1, n)
            st = nms.frame_stats(traj[:, -1], labels, h_dec)
            refined = model.refine_fast(dia_params, traj)
            prep = prepare(refined, llr, labels, h_osd, k)
            out = sliding_osd(
                prep, teps, mask, acc, fcn_params, k,
                window=window, soft_margin=soft_margin, bounds=bounds,
                use_kernel=use_kernel,
            )
            if not with_iteration_stats:
                return out, refined, st["detected_failure"]
            # per-row, per-slot CE/BER (reference 'CE list'/'BER list'
            # bookkeeping, ms_test.py:251-267 / nn_testing.py:205-210);
            # the LAST column is the DIA-refined slot.  f32 on device (the
            # host helper sums in f64; diagnostic-level difference only).
            stacked = jnp.concatenate([traj, refined[:, None, :]], axis=1)
            logits = -stacked
            z = labels.astype(jnp.float32)[:, None, :]
            ce_rows = jnp.sum(
                jnp.maximum(logits, 0) - logits * z
                + jnp.log1p(jnp.exp(-jnp.abs(logits))),
                axis=2,
            )  # (B, T+2)
            ber_rows = jnp.sum(
                ((stacked <= 0) != (z > 0)).astype(jnp.float32), axis=2
            )  # (B, T+2) bit-error counts
            return out, refined, st["detected_failure"], (ce_rows, ber_rows)

        return step

    fast = build(None)
    state = {"demoted": False, "slow": None}

    def run(*args):
        if not state["demoted"]:
            from ..mc.harness import _attempt_fused

            status, val = _attempt_fused(
                lambda: fast(*args), "fused DL-OSD-from-LLR step"
            )
            if status == "ok":
                return val
            state["demoted"] = True
        if state["slow"] is None:
            state["slow"] = build(False)
        return state["slow"](*args)

    return run
