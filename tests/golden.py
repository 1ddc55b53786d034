"""Slow, obviously-correct numpy reference implementations used as golden
models in tests.  Written directly from the NMS math (normalized min-sum with
product-of-signs and min/submin per check row), evaluated in float64."""

import numpy as np


def softplus(x):
    return np.log1p(np.exp(-abs(x))) + max(x, 0.0)


def nms_decode_golden(h, llr, num_iterations, w_vc=1.0, w_chk=1.0, w_marg=1.0):
    """Per-edge loop NMS decode.  Returns (T+1, B, n) soft outputs."""
    h = np.asarray(h, dtype=np.int64)
    llr = np.asarray(llr, dtype=np.float64)
    batch, n = llr.shape
    m = h.shape[0]
    cv = np.zeros((batch, m, n))
    outs = [llr.copy()]
    for _ in range(num_iterations):
        total = cv.sum(axis=1) + w_vc * llr
        vc = total[:, None, :] * h - cv
        cv_next = np.zeros_like(cv)
        for b in range(batch):
            for i in range(m):
                cols = np.flatnonzero(h[i])
                vals = vc[b, i, cols]
                signs = np.sign(vals)
                sign_prod = np.prod(signs)
                mags = np.abs(vals)
                order = np.argsort(mags, kind="stable")
                min1 = mags[order[0]]
                min2 = mags[order[1]]
                for pos, col in enumerate(cols):
                    mag = min1 if mags[pos] > min1 else min2
                    cv_next[b, i, col] = w_chk * mag * sign_prod * signs[pos]
        cv = cv_next
        outs.append(cv.sum(axis=1) + w_marg * llr)
    return np.stack(outs)
