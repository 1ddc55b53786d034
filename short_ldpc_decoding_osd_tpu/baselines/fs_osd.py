"""FS-OSD (fast-and-scalable OSD, Choi & Jeong 2019) — batched redesign.

The reference walks TEPs one at a time in Python with three data-dependent
stops (``FS_OSD/fs_testing.py:129-176``).  On TPU the same *semantics* are
reproduced without any serial loop (SURVEY.md §7 decision 5):

1. the TEP visiting order is static (order-1..L, each order in the
   deterministic reversed-combination sequence of
   ``generate_sequential_teps``, ``fs_testing.py:32-49``);
2. hard/weighted distances for every TEP come from chunked MXU matmuls;
3. the three stopping rules become prefix scans over the visiting order:
   * tau_e: stop at the first TEP with hard distance < tau_e,
   * tau_psc: a TEP only updates the running best when its hard distance is
     below tau_psc (masked exclusive cumulative min),
   * per-order PNC bound: order j is entered only if its reliability lower
     bound (+ beta*(n-k) slack) is below the running best at its boundary.

Divergence (conscious, documented, and now switchable): when tau_e fires
mid-search the reference scores the *stale* best-so-far codeword against the
label (``fs_testing.py:143-147`` breaks before the update at ``:150-152``)
even though it appends the tau_e codeword to its result list
(``optimal_list``).  The default here scores the tau_e codeword itself
(the intended FS-OSD semantics and what ``optimal_list`` holds); pass
``score_tau_e_codeword=False`` to reproduce the reference's literal line-162
scoring bit-for-bit — the per-frame cross-check in
``scripts/reference_parity.py --mode {fw,ref,combine}-base`` runs both and
quantifies the gap (docs/REFPARITY.md §7).
"""

from __future__ import annotations

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import common


def sequential_tep_matrix(k: int, order_limit: int) -> tuple[np.ndarray, np.ndarray]:
    """TEPs of order 1..order_limit in the FS visiting order.

    Order-j sequence: for each combination (ascending lexicographic) of j
    positions, set those bits then reverse the vector
    (``generate_sequential_teps``)."""
    n_teps = sum(math.comb(k, w) for w in range(1, order_limit + 1))
    if n_teps > 4_000_000:
        raise ValueError(
            f"FS baseline TEP set C({k},<= {order_limit}) = {n_teps:,} rows "
            "is impractical for large k; lower order_limit (see pb_osd."
            "weight_limited_teps for the rationale)"
        )
    rows = []
    starts = [0]
    for w in range(1, order_limit + 1):
        for combo in itertools.combinations(range(k), w):
            row = np.zeros(k, dtype=np.int8)
            row[list(combo)] = 1
            rows.append(row[::-1])
        starts.append(len(rows))
    return np.stack(rows), np.asarray(starts)


def pnc_bounds(inputs_sorted: jnp.ndarray, k: int, order_limit: int) -> jnp.ndarray:
    """(B, L) per-order reliability lower bounds: cumulative sums of the
    least-reliable MRB magnitudes (``acquire_pnc_boundary``,
    ``fs_testing.py:22-30``)."""
    tail = jnp.abs(inputs_sorted[:, :k])[:, ::-1]  # ascending within MRB tail
    csum = jnp.cumsum(tail[:, :order_limit], axis=1)
    return csum


def _exclusive_cummin(x: jnp.ndarray, init: jnp.ndarray) -> jnp.ndarray:
    """runmin[i] = min(init, x[0..i-1]) along the last axis."""
    cm = jax.lax.associative_scan(jnp.minimum, x, axis=-1)
    shifted = jnp.concatenate([jnp.full_like(x[..., :1], jnp.inf), cm[..., :-1]], axis=-1)
    return jnp.minimum(shifted, init[..., None])


def fs_osd(
    inputs,
    labels,
    g,
    k: int,
    order_limit: int = 3,
    beta: float = 0.1,
    d_min: int = 14,
    tau_psc: int = 30,
    chunk: int = 2048,
    score_tau_e_codeword: bool = True,
):
    """Batched FS-OSD.  Returns per-frame success flags + TEP counts."""
    n = inputs.shape[1]
    teps, starts = sequential_tep_matrix(k, order_limit)
    n_teps = teps.shape[0]
    tau_e = math.floor(d_min - 1) / 2

    prep = common.prepare_g_domain(inputs, labels, jnp.asarray(g), k)
    terms = common.candidate_distance_terms(prep, k)

    # distances for every TEP in visiting order (chunked scan)
    pad = (-n_teps) % chunk
    teps_p = np.concatenate([teps, np.zeros((pad, k), np.int8)], axis=0)
    chunks = jnp.asarray(teps_p).reshape(-1, chunk, k)

    def body(_, tep_chunk):
        wd, hd, _ = common.tep_distances(terms, tep_chunk, prep["p_matrix"])
        return None, (wd, hd)

    _, (wds, hds) = jax.lax.scan(body, None, chunks)
    wd = jnp.transpose(wds, (1, 0, 2)).reshape(wds.shape[1], -1)[:, :n_teps]
    hd = jnp.transpose(hds, (1, 0, 2)).reshape(hds.shape[1], -1)[:, :n_teps]

    wd0 = terms["c_w"]  # zero-TEP weighted distance
    hd0 = terms["c_h"]
    zero_stop = hd0 < tau_e

    # running best (exclusive) under the tau_psc update rule
    psc_ok = hd < tau_psc
    wd_eff = jnp.where(psc_ok, wd, jnp.inf)
    runmin = _exclusive_cummin(wd_eff, wd0)  # (B, N)

    # order gating: order j entered iff bound_j < runmin at its start index
    bounds = pnc_bounds(prep["inputs"], k, order_limit) + beta * (n - k)  # (B, L)
    start_idx = jnp.asarray(starts[:-1], jnp.int32)  # (L,)
    runmin_at_start = runmin[:, start_idx]  # (B, L)
    gate_fail = bounds >= runmin_at_start  # (B, L)
    any_gate_fail = jnp.any(gate_fail, axis=1)
    first_fail_order = jnp.argmax(gate_fail, axis=1)
    gate_stop_idx = jnp.where(
        any_gate_fail, jnp.asarray(starts[:-1])[first_fail_order], n_teps
    )  # index of first TEP NOT processed

    # tau_e stop: first index with hd < tau_e, if before the gate stop
    e_mask = hd < tau_e
    any_e = jnp.any(e_mask, axis=1)
    first_e = jnp.argmax(e_mask, axis=1)
    e_stop_valid = jnp.logical_and(any_e, first_e < gate_stop_idx)

    processed = jnp.where(e_stop_valid, first_e + 1, gate_stop_idx)
    num_teps = 1 + jnp.where(zero_stop, 0, processed)

    # final TEP: tau_e winner, else the runmin argmin among processed TEPs.
    # Literal reference semantics (score_tau_e_codeword=False): the frame is
    # judged on the best psc-qualified codeword found BEFORE the tau_e TEP
    # (fs_testing.py:162 scores the stale ``optimal_codeword`` variable; the
    # break at :147 happens before the :150-152 update)
    idx = jnp.arange(n_teps)[None, :]
    scored_lim = jnp.where(
        e_stop_valid,
        jnp.where(score_tau_e_codeword, first_e + 1, first_e),
        gate_stop_idx,
    )
    in_range = idx < scored_lim[:, None]
    wd_masked = jnp.where(jnp.logical_and(psc_ok, in_range), wd, jnp.inf)
    best_idx = jnp.argmin(wd_masked, axis=1)
    best_wd = jnp.min(wd_masked, axis=1)
    chosen_is_e = jnp.logical_and(
        jnp.logical_and(e_stop_valid, jnp.logical_not(zero_stop)),
        score_tau_e_codeword,
    )
    chosen_idx = jnp.where(chosen_is_e, first_e, best_idx)
    use_zero = jnp.where(
        chosen_is_e, False, jnp.logical_or(zero_stop, best_wd >= wd0)
    )

    tep_all = jnp.asarray(teps).astype(jnp.float32)
    tep_sel = jnp.where(use_zero[:, None], 0.0, tep_all[chosen_idx])
    mrb_c = jnp.abs(terms["mrb0"] - tep_sel)
    prods = jnp.einsum("bk,bkl->bl", tep_sel, prep["p_matrix"].astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
    a = prods - 2.0 * jnp.floor(prods * 0.5)
    lrb_c = jnp.abs(terms["lrb0"] - a)
    cand = jnp.concatenate([mrb_c, lrb_c], axis=1)
    success = jnp.all(cand == prep["labels"].astype(jnp.float32), axis=1)
    return {
        "success": success,
        "num_teps": num_teps,
        "zero_stop": zero_stop,
        "tau_e_stop": e_stop_valid,
        "gate_stop": jnp.logical_and(any_gate_fail, jnp.logical_not(e_stop_valid)),
    }
