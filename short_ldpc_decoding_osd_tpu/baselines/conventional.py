"""Conventional OSD (full order-<=L enumeration) + miracle-view oracle.

Batched redesigns of ``FS_OSD/convention_osd.py:13-77`` and
``FS_OSD/fs_testing.py:324-341``.  The TEP set is static; the whole batch is
scored with MXU matmuls and one argmin."""

from __future__ import annotations

import collections
import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import common


def full_tep_matrix(k: int, order_limit: int) -> tuple[np.ndarray, np.ndarray]:
    """All TEPs of weight 0..order_limit (static), plus order boundaries.

    Row order inside each weight class follows the reference's
    sum-of-indices-descending sort (``convention_osd.py:13-26``) — the order
    only matters for phase attribution, which uses the boundaries."""
    import math

    n_teps = sum(math.comb(k, w) for w in range(order_limit + 1))
    if n_teps > 4_000_000:
        raise ValueError(
            f"conventional-OSD TEP set C({k},<= {order_limit}) = {n_teps:,} "
            "rows is impractical for large k; lower order_limit (see "
            "pb_osd.weight_limited_teps for the rationale)"
        )
    rows = [np.zeros(k, dtype=np.int8)]
    boundaries = [1]
    for w in range(1, order_limit + 1):
        combos = list(itertools.combinations(range(k), w))
        combos.sort(key=lambda c: -sum(c))
        for c in combos:
            row = np.zeros(k, dtype=np.int8)
            row[list(c)] = 1
            rows.append(row)
        boundaries.append(len(rows))
    return np.stack(rows), np.asarray(boundaries)


def _chunked_weighted_distance(terms, teps, p_matrix, chunk: int = 2048):
    """wd over a large static TEP matrix, scanned in fixed-size chunks."""
    n_teps = teps.shape[0]
    pad = (-n_teps) % chunk
    teps_p = jnp.concatenate(
        [jnp.asarray(teps), jnp.zeros((pad, teps.shape[1]), teps.dtype)], axis=0
    )
    chunks = teps_p.reshape(-1, chunk, teps.shape[1])

    def body(_, tep_chunk):
        wd, _, _ = common.tep_distances(terms, tep_chunk, p_matrix)
        return None, wd

    _, wds = jax.lax.scan(body, None, chunks)  # (C, B, chunk)
    wd = jnp.transpose(wds, (1, 0, 2)).reshape(wds.shape[1], -1)
    return wd[:, :n_teps]


def conventional_osd(inputs, labels, g, k: int, order_limit: int = 3, chunk: int = 2048):
    """Batched conventional OSD.  Returns per-frame success, argmin index,
    and belonged phase (order of the chosen TEP)."""
    teps, boundaries = full_tep_matrix(k, order_limit)
    prep = common.prepare_g_domain(inputs, labels, jnp.asarray(g), k)
    terms = common.candidate_distance_terms(prep, k)
    wd = _chunked_weighted_distance(terms, teps, prep["p_matrix"], chunk)
    best = jnp.argmin(wd, axis=1)
    # reconstruct the chosen candidate and compare to the label
    tep_sel = jnp.asarray(teps)[best].astype(jnp.float32)  # (B, k)
    mrb_c = jnp.abs(terms["mrb0"] - tep_sel)  # xor with 0/1 floats
    prods = jnp.einsum("bk,bkl->bl", tep_sel, prep["p_matrix"].astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
    a = prods - 2.0 * jnp.floor(prods * 0.5)
    lrb_c = jnp.abs(terms["lrb0"] - a)
    cand = jnp.concatenate([mrb_c, lrb_c], axis=1)
    success = jnp.all(cand == prep["labels"].astype(jnp.float32), axis=1)
    phase = jnp.searchsorted(jnp.asarray(boundaries), best, side="right")
    return {
        "success": success,
        "best_index": best,
        "phase": phase,
        "num_teps": teps.shape[0],
    }


def miracle_view(inputs, labels, g, k: int):
    """Histogram of true MRB error weights: the FER floor of any order-p OSD
    (``fs_testing.py:324-341``)."""
    prep = common.prepare_g_domain(inputs, labels, jnp.asarray(g), k)
    hard = (prep["inputs"] <= 0).astype(jnp.int32)
    err = jnp.sum(
        (hard[:, :k] != prep["labels"][:, :k].astype(jnp.int32)).astype(jnp.int32),
        axis=1,
    )
    return collections.Counter(np.asarray(err).tolist())


def miracle_fer_floor(counter: collections.Counter, order: int) -> float:
    """P(true MRB error weight > order) — the residual FER of an ideal
    order-``order`` OSD."""
    total = sum(counter.values())
    bad = sum(v for w, v in counter.items() if w > order)
    return bad / max(total, 1)
