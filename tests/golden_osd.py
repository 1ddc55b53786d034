"""Host golden model of the DL-OSD semantics (per-frame numpy loops),
written directly from the algorithm description for cross-checking the
batched TPU engine."""

import numpy as np

from short_ldpc_decoding_osd_tpu.codes import gf2


def prepare_frame(updated, original, labels, h, k):
    n = h.shape[1]
    perm = np.argsort(np.abs(updated), kind="stable")
    h_p = h[:, perm]
    reduced, swaps = gf2.row_reduce(h_p.copy())
    order = gf2.apply_swaps_to_index(n, swaps)
    mrb = order[-k:]
    sort_idx = np.argsort(mrb)
    index_order = np.concatenate([order[: n - k], np.sort(mrb)])
    m_matrix = reduced[:, -k:][:, sort_idx]
    full = perm[index_order]
    ou = updated[full]
    oo = original[full]
    ol = labels[full].astype(int)
    hard_o = np.where(oo > 0, 0, 1)
    hard_u = np.where(ou > 0, 0, 1)
    mag = np.abs(oo)
    truth = float(((ol ^ hard_o) * mag).sum())
    return m_matrix, hard_o, hard_u, mag, truth


def block_minima_frame(m_matrix, hard_o, hard_u, mag, blocks, k):
    base_mrb = hard_u[-k:]
    mins = []
    for teps in blocks:
        mrb_c = (teps + base_mrb) % 2  # (N, k)
        lrb_c = (mrb_c @ m_matrix.T) % 2  # (N, m)
        cand = np.concatenate([lrb_c, mrb_c], axis=1)
        disc = (((cand + hard_o) % 2) * mag).sum(axis=1)
        mins.append(float(disc.min()))
    return mins


def serial_walk(block_mins, w1, w2, window=5, soft_margin=0.9):
    """The reference's serial sliding-window walk on a list of block minima."""
    win = list(block_mins[:window])
    gmin = min(win)
    evals = 0
    deep = window
    kk_final = 0
    for kk in range(len(block_mins) - window + 1):
        deep = kk + window
        kk_final = kk
        if kk != 0:
            ms = block_mins[kk + window - 1]
            win.append(ms)
            win = win[-window:]
            if ms > gmin:
                continue
        feats = np.asarray(sorted(win) + [float(kk)], dtype=np.float32)
        logits = feats @ w1 @ w2
        exp = np.exp(logits - logits.max())
        probs = exp / exp.sum()
        evals += 1
        gmin = min(gmin, min(win))
        if probs[1] > soft_margin:
            break
    return {
        "global_min": gmin,
        "deep_limit": deep,
        "window_num": deep - window + 1,
        "stop_k": kk_final,
        "evals": evals,
    }
