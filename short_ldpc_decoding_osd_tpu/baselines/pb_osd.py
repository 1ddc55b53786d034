"""PB-OSD (probability-based OSD, Yue et al. 2021) — batched redesign.

The reference maintains a dynamic priority list of TEPs, popping the one with
the smallest MRB reliability sum and lazily pushing "extended"/"adjacent"
successors (``PB_OSD/pb_testing.py:339-397``).  That enumeration provably
pops TEPs in ascending reliability-sum order (each successor's metric
dominates its parent's: extending appends the least-reliable position,
adjacent moves an index to a more reliable slot — both only increase the
sum).  The TPU redesign therefore *sorts*: score every TEP of weight
1..order_limit with one MXU matmul, argsort per frame, and evaluate the two
probabilistic stopping rules as prefix scans along the sorted order — the
same visit sequence and stop decisions with zero serial control flow.

Stopping rules (``pb_testing.py:100-157, 399-500``):
* unpromising: p_e_pro(tep) < p_t_pro where p_e_pro is a 2-component
  binomial-mixture CDF at beta = floor((w_dmin - relsum)/mean_lrb_rel);
* success: on a running-min improvement, p_e_suc > p_t_suc = 0.99*nu with
  p_e_suc = 1 / (1 + (1-tep_p)/(tep_p * prod_product)).
"""

from __future__ import annotations

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import common


def weight_limited_teps(k: int, order_limit: int) -> np.ndarray:
    """All nonzero TEPs of weight <= order_limit (static, visiting order is
    decided per frame by the reliability sort)."""
    n_teps = sum(math.comb(k, w) for w in range(1, order_limit + 1))
    if n_teps > 4_000_000:
        # C(880,3) ~ 113M rows x k int8 would be ~100 GB; the full-TEP
        # baselines are defined for SHORT codes (the reference runs them on
        # (128,64) only) — fail with guidance instead of OOMing the host
        raise ValueError(
            f"PB/conventional baseline TEP set C({k},<= {order_limit}) = "
            f"{n_teps:,} rows is impractical; lower order_limit (the "
            "learned DL-OSD path with per-code operating points is the "
            "scalable decoder for large k)"
        )
    rows = []
    for w in range(1, order_limit + 1):
        for combo in itertools.combinations(range(k), w):
            row = np.zeros(k, dtype=np.int8)
            row[list(combo)] = 1
            rows.append(row)
    return np.stack(rows)


def _tep_push_counts(teps: np.ndarray, k: int, order_limit: int) -> np.ndarray:
    """Successors each TEP pushes when popped (``optimal_tep_sequence``,
    ``pb_testing.py:366-397``): an "extended" TEP (append position k-1) iff
    the rightmost 1 is left of k-1 and the weight is below the order limit,
    and an "adjacent" TEP (move the rightmost 1 one position left) iff that
    slot is free.  The successor graph is a TREE — every TEP of weight
    1..order_limit has exactly one parent (extended children end at k-1;
    adjacent children are recovered by moving their rightmost 1 back right)
    — so the reference's dedupe (``append_row_if_not_exists``) never fires
    and the maintained-list size is a pure function of the pop order:
    size_before_pop(t) = 1 + sum_{j<t} pushes(pop_j) - t."""
    counts = np.zeros(len(teps), np.int32)
    for i, t in enumerate(teps):
        nz = np.nonzero(t)[0]
        w, r = len(nz), nz[-1]
        c = 0
        if r < k - 1 and w < order_limit:
            c += 1  # extended successor exists
        if w > 1:
            if nz[-1] - nz[-2] > 1:
                c += 1  # adjacent slot free
        elif r > 0:
            c += 1
        counts[i] = c
    return counts


def _log_binom_table(n: int) -> np.ndarray:
    lg = np.zeros(n + 1)
    for i in range(1, n + 1):
        lg[i] = lg[i - 1] + math.log(n - i + 1) - math.log(i)
    return lg


def _binom_cdf_table(n: int, p: jnp.ndarray, log_comb: jnp.ndarray) -> jnp.ndarray:
    """CDF table F(b) = P(X <= b), b = 0..n, X ~ Binom(n, p); p may be a
    (B,) vector -> (B, n+1) table.  Computed in log space on device."""
    p = jnp.clip(p, 1e-12, 1.0 - 1e-12)
    i = jnp.arange(n + 1, dtype=jnp.float32)
    logpmf = (
        log_comb[None, :]
        + i[None, :] * jnp.log(p)[:, None]
        + (n - i)[None, :] * jnp.log1p(-p)[:, None]
    )
    return jnp.cumsum(jnp.exp(logpmf), axis=1)


def _exclusive_cummin(x: jnp.ndarray, init: jnp.ndarray) -> jnp.ndarray:
    cm = jax.lax.associative_scan(jnp.minimum, x, axis=-1)
    shifted = jnp.concatenate(
        [jnp.full_like(x[..., :1], jnp.inf), cm[..., :-1]], axis=-1
    )
    return jnp.minimum(shifted, init[..., None])


def pb_osd(
    inputs,
    labels,
    g,
    k: int,
    snr_db: float,
    order_limit: int = 3,
    chunk: int = 2048,
):
    """Batched PB-OSD at one SNR point.  Returns success flags + complexity
    metrics matching the reference accounting."""
    n = inputs.shape[1]
    m = n - k
    noise_variance = 10.0 ** (-snr_db / 10.0)  # reference's 1/gamma
    teps = weight_limited_teps(k, order_limit)
    n_teps = teps.shape[0]
    n_max = 1 + n_teps  # sum_{i<=L} C(k,i)

    prep = common.prepare_g_domain(inputs, labels, jnp.asarray(g), k)
    terms = common.candidate_distance_terms(prep, k)
    mag = terms["mag"]
    # bit error probabilities s_i = sigmoid(-4*nv*|llr_i|)
    s = jax.nn.sigmoid(-4.0 * noise_variance * mag)
    p1 = jnp.mean(s[:, k:], axis=1)  # mean LRB error prob
    pt = jnp.mean(s[:, :k], axis=1)  # mean MRB error prob
    log_comb_k = jnp.asarray(_log_binom_table(k), jnp.float32)
    log_comb_m = jnp.asarray(_log_binom_table(m), jnp.float32)
    nu = _binom_cdf_table(k, pt, log_comb_k)[:, order_limit]
    p_t_suc = 0.99 * nu
    comb_sum = float(sum(math.comb(k, i) for i in range(order_limit + 1)))
    p_t_pro = 0.002 * jnp.sqrt((1.0 - nu) / comb_sum)
    # log prob of the all-correct MRB: prod (1 - s_i)
    spl_log = jnp.sum(jnp.log1p(-jnp.clip(s[:, :k], 0.0, 1.0 - 1e-12)), axis=1)
    mean_lrb_rel = jnp.mean(mag[:, k:], axis=1)

    # per-TEP quantities via chunked matmuls: wd, relsum, log prob product
    log2p0 = jnp.log(2.0 * jnp.clip(1.0 - s[:, k:], 1e-30, None))  # (B, m)
    log2p1 = jnp.log(2.0 * jnp.clip(s[:, k:], 1e-30, None))
    d0 = terms["d0"]
    c_p = jnp.sum(jnp.where(d0 > 0, log2p1, log2p0), axis=1)
    v_p = (log2p1 - log2p0) * (1.0 - 2.0 * d0)

    pad = (-n_teps) % chunk
    teps_p = np.concatenate([teps, np.zeros((pad, k), np.int8)], axis=0)
    chunks = jnp.asarray(teps_p).reshape(-1, chunk, k)
    w_m = mag[:, :k]

    def body(_, tep_chunk):
        tep_f = tep_chunk.astype(jnp.float32)
        wd, _, a = common.tep_distances(terms, tep_chunk, prep["p_matrix"])
        relsum = jnp.matmul(w_m, tep_f.T,
                            precision=jax.lax.Precision.HIGHEST)  # (B, chunk)
        logprod = c_p[:, None] + jnp.einsum("bl,bnl->bn", v_p, a,
                                            precision=jax.lax.Precision.HIGHEST)
        return None, (wd, relsum, logprod)

    _, (wds, rels, lps) = jax.lax.scan(body, None, chunks)
    resh = lambda x: jnp.transpose(x, (1, 0, 2)).reshape(x.shape[1], -1)[:, :n_teps]
    wd, relsum, logprod = resh(wds), resh(rels), resh(lps)

    # visiting order: ascending reliability sum (the priority-queue pop order)
    order = jnp.argsort(relsum, axis=1, stable=True)
    wd_s = jnp.take_along_axis(wd, order, axis=1)
    rel_s = jnp.take_along_axis(relsum, order, axis=1)
    lp_s = jnp.take_along_axis(logprod, order, axis=1)

    wd0 = terms["c_w"]
    runmin = _exclusive_cummin(wd_s, wd0)  # w_dmin before each pop

    # p_e_pro (evaluated at every pop, against the pre-pop w_dmin)
    tep_logp = -4.0 * noise_variance * rel_s + spl_log[:, None]
    tep_p = jnp.exp(tep_logp)
    beta = jnp.clip(
        jnp.floor((runmin - rel_s) / mean_lrb_rel[:, None]), 0.0, float(m)
    ).astype(jnp.int32)
    cdf1 = _binom_cdf_table(m, p1, log_comb_m)  # (B, m+1)
    half = jnp.full_like(p1, 0.5)
    cdf2 = _binom_cdf_table(m, half, log_comb_m)
    pro1 = jnp.take_along_axis(cdf1, beta, axis=1)
    pro2 = jnp.take_along_axis(cdf2, beta, axis=1)
    p_e_pro = tep_p * pro1 + (1.0 - tep_p) * pro2
    unpromising = p_e_pro < p_t_pro[:, None]

    # p_e_suc (evaluated only on running-min improvements)
    improvement = wd_s < runmin
    ratio = jnp.exp(-tep_logp) * (1.0 - tep_p)  # (1-p)/p, stable in log space
    p_e_suc = 1.0 / (1.0 + ratio * jnp.exp(-lp_s))
    suc_fire = jnp.logical_and(improvement, p_e_suc > p_t_suc[:, None])

    stop_mask = jnp.logical_or(unpromising, suc_fire)
    any_stop = jnp.any(stop_mask, axis=1)
    first_stop = jnp.argmax(stop_mask, axis=1)
    cost = jnp.where(any_stop, first_stop + 1, n_max)

    # chosen codeword: on suc stop -> that TEP; else best improvement < stop
    stopped_by_suc = jnp.take_along_axis(suc_fire, first_stop[:, None], axis=1)[:, 0]
    limit = jnp.where(any_stop, first_stop, n_teps)  # exclusive for unpromising
    idx = jnp.arange(n_teps)[None, :]
    in_range = idx < jnp.where(stopped_by_suc, limit + 1, limit)[:, None]
    wd_lim = jnp.where(in_range, wd_s, jnp.inf)
    best_pos = jnp.argmin(wd_lim, axis=1)
    best_wd = jnp.min(wd_lim, axis=1)
    use_zero = best_wd >= wd0

    chosen_sorted_pos = jnp.where(stopped_by_suc, first_stop, best_pos)
    chosen_tep_idx = jnp.take_along_axis(order, chosen_sorted_pos[:, None], axis=1)[:, 0]
    tep_all = jnp.asarray(teps).astype(jnp.float32)
    tep_sel = jnp.where(use_zero[:, None], 0.0, tep_all[chosen_tep_idx])
    mrb_c = jnp.abs(terms["mrb0"] - tep_sel)
    prods = jnp.einsum("bk,bkl->bl", tep_sel, prep["p_matrix"].astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
    a = prods - 2.0 * jnp.floor(prods * 0.5)
    lrb_c = jnp.abs(terms["lrb0"] - a)
    cand = jnp.concatenate([mrb_c, lrb_c], axis=1)
    success = jnp.all(cand == prep["labels"].astype(jnp.float32), axis=1)

    # reference side metrics: w_de evaluations and improvement count.
    # suc2 counts pops that reached the p_e_suc evaluation (pb_testing.py:139-144)
    # — a pop where the PRO stop fired never gets its improvement counted,
    # so the range is idx < limit plus the suc-firing pop itself.
    eval_mask = jnp.logical_and(idx < limit[:, None], jnp.logical_not(unpromising))
    suc1 = jnp.sum(eval_mask.astype(jnp.int32), axis=1) + stopped_by_suc.astype(
        jnp.int32
    )
    suc2 = jnp.sum(
        jnp.logical_and(improvement, idx < limit[:, None]).astype(jnp.int32), axis=1
    ) + stopped_by_suc.astype(jnp.int32)

    # maintained-list-length metric (pb_testing.py:120-122,166,196-209):
    # memory_sum accumulates a per-pop comparison counter — 1 while the
    # priority list holds a single TEP, else 2.  The list size follows the
    # static successor tree (see _tep_push_counts); pops executed =
    # first_stop+1 on an early stop, else N_max-1 (the loop range).
    pushes = jnp.asarray(_tep_push_counts(teps, k, order_limit), jnp.int32)
    pushes_s = jnp.take(pushes, order)  # (B, N) pushes in visiting order
    cum_push = jnp.cumsum(pushes_s, axis=1) - pushes_s  # exclusive
    size_before = 1 + cum_push - idx  # list size before pop t
    comparison = jnp.where(size_before <= 1, 1, 2).astype(jnp.int32)
    pops = jnp.where(any_stop, cost, n_max - 1)
    maintained = jnp.sum(
        jnp.where(idx < pops[:, None], comparison, 0), axis=1
    )
    return {
        "success": success,
        "num_teps": cost,
        "n_max": n_max,
        "stopped_by_suc": stopped_by_suc,
        "stopped_by_pro": jnp.logical_and(any_stop, jnp.logical_not(stopped_by_suc)),
        "suc_evals": suc1,
        "improvements": suc2,
        "maintained_list": maintained,
    }
