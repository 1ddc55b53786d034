"""Host golden models for the G-domain baselines (serial, per frame)."""

import numpy as np

from short_ldpc_decoding_osd_tpu.codes import gf2


def host_prepare_g(inputs, labels, g, k):
    n = inputs.shape[0]
    order = np.argsort(-np.abs(inputs), kind="stable")
    g_sorted = g[:, order].astype(np.uint8)
    reduced, swaps = gf2.row_reduce(g_sorted.copy())
    col_order = gf2.apply_swaps_to_index(n, swaps)
    mrb, lrb = col_order[:k], col_order[k:]
    ms, ls = np.argsort(mrb), np.argsort(lrb)
    p = reduced[:, k:][ms][:, ls]
    index_order = np.concatenate([np.sort(mrb), np.sort(lrb)])
    full = order[index_order]
    return inputs[full], labels[full].astype(int), p.astype(int)


def _dist(tep, mrb0, lrb0, p, hard, mag):
    mrb_c = mrb0 ^ tep
    lrb_c = (mrb_c @ p) % 2
    cand = np.concatenate([mrb_c, lrb_c])
    d = cand ^ hard
    return float((d * mag).sum()), int(d.sum()), cand


def fs_golden(inputs, labels, p, k, tep_seq, starts, order_limit, beta, tau_e, tau_psc):
    """Serial FS-OSD walk with the *intended* tau_e semantics (the selected
    codeword is the tau_e winner)."""
    n = inputs.shape[0]
    hard = np.where(inputs > 0, 0, 1)
    mag = np.abs(inputs)
    mrb0 = hard[:k]
    lrb0 = (mrb0 @ p) % 2
    wd0, hd0, cand0 = _dist(np.zeros(k, int), mrb0, lrb0, p, hard, mag)
    num = 1
    if hd0 < tau_e:
        return (cand0 == labels).all(), num
    mrb_tail = np.sort(mag[:k])  # ascending magnitudes within MRB
    w_dmin, opt = wd0, cand0
    for j in range(order_limit):
        bound = mrb_tail[: j + 1].sum() + beta * (n - k)
        if bound >= w_dmin:
            break
        for i in range(starts[j], starts[j + 1]):
            num += 1
            wd, hd, cand = _dist(tep_seq[i].astype(int), mrb0, lrb0, p, hard, mag)
            if hd < tau_e:
                return (cand == labels).all(), num
            if hd < tau_psc and wd < w_dmin:
                w_dmin, opt = wd, cand
    return (opt == labels).all(), num


def pb_golden(inputs, labels, p, k, teps, snr_db, order_limit):
    """Serial PB-OSD walk over the reliability-sum-sorted TEP order."""
    from scipy import stats

    n = inputs.shape[0]
    m = n - k
    nv = 10 ** (-snr_db / 10.0)
    hard = np.where(inputs > 0, 0, 1)
    mag = np.abs(inputs)
    s = 1.0 / (1.0 + np.exp(4.0 * nv * mag))
    p1 = s[k:].mean()
    pt = s[:k].mean()
    nu = stats.binom.cdf(order_limit, k, pt)
    p_t_suc = 0.99 * nu
    import math

    comb_sum = sum(math.comb(k, i) for i in range(order_limit + 1))
    p_t_pro = 0.002 * np.sqrt((1 - nu) / comb_sum)
    spl = np.prod(1.0 - s[:k])
    mean_lrb = mag[k:].mean()
    mrb0 = hard[:k]
    lrb0 = (mrb0 @ p) % 2
    wd0, _, cand0 = _dist(np.zeros(k, int), mrb0, lrb0, p, hard, mag)
    rels = teps @ mag[:k]
    order = np.argsort(rels, kind="stable")
    w_dmin, opt = wd0, cand0
    cost = None
    for pos, ti in enumerate(order):
        tep = teps[ti].astype(int)
        relsum = float(rels[ti])
        tep_p = np.exp(-4.0 * nv * relsum) * spl
        beta = min(max(0.0, np.floor((w_dmin - relsum) / mean_lrb)), float(m))
        pro = tep_p * stats.binom.cdf(beta, m, p1) + (1 - tep_p) * stats.binom.cdf(
            beta, m, 0.5
        )
        if pro < p_t_pro:
            cost = pos + 1
            break
        wd, _, cand = _dist(tep, mrb0, lrb0, p, hard, mag)
        if wd < w_dmin:
            w_dmin, opt = wd, cand
            d_lrb = (cand ^ hard)[k:]
            prob_product = np.prod(np.where(d_lrb > 0, 2 * s[k:], 2 * (1 - s[k:])))
            ratio = (1 - tep_p) / tep_p
            p_e_suc = 1.0 / (1.0 + ratio / prob_product)
            if p_e_suc > p_t_suc:
                cost = pos + 1
                break
    if cost is None:
        cost = len(order) + 1
    return (opt == labels).all(), cost


def pb_queue_golden(mag_mrb, order_limit, n_pops):
    """Dynamic priority-list TEP enumeration exactly as the reference
    (``PB_OSD/pb_testing.py:339-397``): an actual maintained list, min-pop
    by MRB reliability sum, extend/adjacent successor pushes with an
    existence check.  mag_mrb must be DESCENDING (the G-domain MRB layout).
    Returns (popped TEP index-tuples, per-pop comparison counters, max list
    size).  Raises if the reference's dedupe would ever fire — the successor
    graph is a tree, which is what makes the framework's static
    maintained-list computation exact."""
    k = len(mag_mrb)
    lst = [(k - 1,)]
    seen = {(k - 1,)}
    popped, counters = [], []
    max_size = 1
    for _ in range(n_pops):
        rels = [sum(mag_mrb[list(t)]) for t in lst]
        i = int(np.argmin(rels))
        counters.append(1 if len(lst) == 1 else 2)
        t = lst.pop(i)
        popped.append(t)
        nz = list(t)
        pushes = []
        if nz[-1] < k - 1 and len(nz) < order_limit:
            pushes.append(tuple(nz + [k - 1]))  # extended
        if len(nz) > 1:
            if nz[-1] - nz[-2] > 1:
                pushes.append(tuple(nz[:-1] + [nz[-1] - 1]))  # adjacent
        elif nz[-1] - 1 > -1:
            pushes.append((nz[-1] - 1,))
        for nt in pushes:
            if nt in seen:
                raise AssertionError(f"duplicate push {nt}: tree claim violated")
            seen.add(nt)
            lst.append(nt)
        max_size = max(max_size, len(lst))
    return popped, counters, max_size
