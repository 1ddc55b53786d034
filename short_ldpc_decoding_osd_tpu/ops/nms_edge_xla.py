"""Edge-layout NMS decoding in pure XLA: the large-code fast rung.

The dense decoder (``ops/nms.py``) carries a ``(B, m, n)`` masked message
tensor — exact, but for a production-scale code like WiMAX (1056, 880) that
is 743 KB/frame/tensor round-tripping HBM every iteration, and the VMEM edge
kernel (``nms_edge_pallas``) cannot help: its stacked incidence constants
alone are ``2*dc*m*n`` f32 ≈ 62 MiB, far over scoped VMEM.  This module is
the TPU answer for codes above the VMEM envelope: messages live in the
*edge* layout ``(B, m, dc)`` (dc = max check degree, irregular rows padded),
53x smaller than dense for WiMAX, and the two layout changes per iteration —
scatter edge messages to column totals, gather column totals back to edges —
are one-hot incidence **matmuls** ``(B, E) @ (E, n)`` / ``(B, n) @ (n, E)``
that stream through the MXU with XLA's own HBM tiling, so there is no
VMEM-fit precondition at any code size.

Semantics per iteration are exactly ``ops.nms``'s dense update
(reference ``Ldpc_128_training/ms_decoder_dense.py:65-241``): min/submin
over the *other* edges of the row with duplicate-minimum handling, sign by
negative-count parity with zero propagation, identical variant weightings
(`_weights`).  The only difference from the dense path is f32 summation
order inside the incidence matmuls (run at ``Precision.HIGHEST`` — each
product is exact, so the result differs from the dense reduction only by
addition reordering, ~1e-6 relative; hard decisions agree in practice and
the MC harness's capture-confirm re-decode guards the remainder, see
``mc/harness.py``).

Measured (v5e, WiMAX (1056, 880), 12 iterations): the dense XLA capture
step runs 8.0k cw/s at its 4096-frame memory bound; this rung replaces it
at the same semantics with an MXU-bound program (see bench probe in
docs/ROUND5.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import nms as _nms

__all__ = [
    "edge_layout",
    "incidence_matrices",
    "decode_edge_xla",
    "decode_final_edge_xla",
]


def edge_layout(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Padded static edge layout: (edge_cols (m, dc) int32, real (m, dc) bool).

    Row ``i``'s first ``deg(i)`` slots hold its column indices; padding
    slots carry column 0 with ``real=False`` (they are excluded from the
    incidence matrices, the min tournament, and the sign parity, so the
    placeholder index is inert).  Unlike ``nms.edge_columns`` this accepts
    irregular check degrees (the WiMAX/DVB-style codes)."""
    rows = [np.flatnonzero(r) for r in np.asarray(h)]
    dc = max(len(r) for r in rows)
    m = len(rows)
    cols = np.zeros((m, dc), np.int32)
    real = np.zeros((m, dc), bool)
    for i, r in enumerate(rows):
        cols[i, : len(r)] = r
        real[i, : len(r)] = True
    return cols, real


def incidence_matrices(h: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(gath (n, E), scat (E, n), edge_cols, real) with E = dc*m flattened
    **dc-major**: edge ``e = q*m + i`` is slot ``q`` of check row ``i``.

    dc-major matters for the on-device layout: work tensors are
    ``(B, dc, m)`` so the minor (lane) dimension is ``m`` — for WiMAX
    (1056, 880) that pads 176 -> 256 (1.45x), where the slot-minor
    ``(B, m, dc)`` layout pads 20 -> 128 (6.4x) and the per-iteration
    elementwise stages become HBM-bound (measured: *negative* batch
    scaling, 71k -> 22k cw/s from B=4k to 64k).

    ``gath[j, e] = 1`` iff edge ``e`` reads column ``j``; ``scat = gath.T``
    restricted the same way.  Padding edges have all-zero rows/columns, so
    they read 0 and contribute 0 — no masking needed around the matmuls."""
    cols, real = edge_layout(h)
    m, dc = cols.shape
    n = np.asarray(h).shape[1]
    e_idx = np.arange(dc * m)
    flat_cols = cols.T.reshape(-1)  # dc-major: slot q of row i at q*m + i
    flat_real = real.T.reshape(-1)
    gath = np.zeros((n, dc * m), np.float32)
    gath[flat_cols[flat_real], e_idx[flat_real]] = 1.0
    return gath, gath.T.copy(), cols, real


def _check_update_minsum_edge(vc, real, w_chk):
    """Min-sum check update on the (B, dc, m) edge layout — same rule as
    ``nms._check_update_minsum`` (min for non-argmin edges, submin for the
    argmin edge, sign = product of the others via negative-count parity,
    zeros poison the row product), with padding slots inert.  All
    reductions run over the dc axis (-2) so the lane dimension stays m."""
    ax = -2
    neg = jnp.logical_and(vc < 0.0, real)
    negcount = jnp.sum(neg.astype(jnp.float32), axis=ax, keepdims=True)
    parity = negcount - 2.0 * jnp.floor(negcount * 0.5)
    anyzero = jnp.any(
        jnp.logical_and(vc == 0.0, real), axis=ax, keepdims=True
    )
    row_sign = jnp.where(anyzero, 0.0, 1.0 - 2.0 * parity)
    own = jnp.where(vc > 0.0, 1.0, jnp.where(vc < 0.0, -1.0, 0.0))
    edge_sign = row_sign * own * real

    mag = jnp.clip(jnp.abs(vc), 0.0, _nms._CLIP)
    masked = jnp.where(real, mag, jnp.inf)
    min1 = jnp.min(masked, axis=ax, keepdims=True)
    arg1 = jnp.argmin(masked, axis=ax)
    slots = jax.lax.broadcasted_iota(jnp.int32, masked.shape, masked.ndim - 2)
    not_first_min = slots != arg1[..., None, :]
    min2 = jnp.min(
        jnp.where(not_first_min, masked, jnp.inf), axis=ax, keepdims=True
    )
    edge_mag = jnp.where(mag > min1, min1, min2) * real
    return w_chk * edge_mag * jax.lax.stop_gradient(edge_sign)


def _check_update_neural_edge(vc, real, params):
    """NMS-r neural check magnitude on the (B, dc, m) edge layout — same
    rule as ``nms._check_update_neural`` (sorted leave-one-out magnitudes
    through the non-negative 2-layer NN, sign by parity).  Regular check
    degree required (as in the dense path), so ``real`` is all-True and
    only shapes the sign computation."""
    ax = -2
    neg = jnp.logical_and(vc < 0.0, real)
    negcount = jnp.sum(neg.astype(jnp.float32), axis=ax, keepdims=True)
    parity = negcount - 2.0 * jnp.floor(negcount * 0.5)
    anyzero = jnp.any(
        jnp.logical_and(vc == 0.0, real), axis=ax, keepdims=True
    )
    row_sign = jnp.where(anyzero, 0.0, 1.0 - 2.0 * parity)
    own = jnp.where(vc > 0.0, 1.0, jnp.where(vc < 0.0, -1.0, 0.0))
    edge_sign = row_sign * own * real

    dc = vc.shape[-2]
    mag = jnp.abs(vc)  # (B, dc, m)
    loo_idx = np.stack(
        [[q for q in range(dc) if q != p] for p in range(dc)]
    )  # (dc, dc-1)
    loo = mag[:, loo_idx, :]  # (B, dc, dc-1, m)
    loo = jnp.sort(loo, axis=2)
    hidden = jnp.einsum("bpqm,qh->bphm", loo, params["nn_w1"])
    mags = jnp.einsum("bphm,ho->bpm", hidden, params["nn_w2"])
    return mags * jax.lax.stop_gradient(edge_sign)


def supports(h: np.ndarray, variant: str) -> bool:
    """True iff this module can decode ``variant`` on ``h``: scalar
    variants always; NMS-r only with a regular check degree (the
    leave-one-out sort is undefined over padding slots — the same
    constraint as the dense path's ``nms.edge_columns``)."""
    if variant != "NMS-r":
        return True
    degs = np.asarray(h).sum(axis=1)
    return bool((degs == degs[0]).all())


def auto_select(h: np.ndarray, variant: str) -> bool:
    """The ONE rung-selection predicate every call site shares: serve
    ``variant`` on ``h`` through this module iff the backend is TPU, the
    variant is supported here, and the code sits above the VMEM kernels'
    envelope (``nms_edge_pallas.auto_block_frames`` returns no usable
    block).  Depends only on code shape + backend, so multi-process mesh
    hosts always agree."""
    if jax.default_backend() != "tpu" or not supports(h, variant):
        return False
    if variant == "NMS-r":
        # no VMEM kernel exists for the neural check update at ANY size,
        # so the rung is the fast path whenever it is supported at all
        return True
    from .nms_edge_pallas import auto_block_frames

    h_np = np.asarray(h)
    dc = int(h_np.sum(axis=1).max())
    return auto_block_frames(h_np.shape[0], h_np.shape[1], dc) < 8


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "bf16": jax.lax.Precision.DEFAULT,
}


def _build(params, h_host, variant, mode="highest"):
    if variant == "NMS-r" and not supports(h_host, variant):
        raise ValueError(
            "NMS-r's leave-one-out check update requires a regular check "
            "degree (matching nms.edge_columns)"
        )
    w_vc, w_chk, w_marg = _nms._weights(params, variant)
    gath, scat, _, real_np = incidence_matrices(h_host)
    gath = jnp.asarray(gath)
    scat = jnp.asarray(scat)
    real = jnp.asarray(real_np.T)  # (dc, m), matching the (B, dc, m) layout
    m, dc = real_np.shape
    prec = _PRECISIONS[mode]

    def colsum(cv):
        # column totals: one-hot scatter matmul (B, E) @ (E, n) on the MXU
        return jnp.matmul(
            cv.reshape(cv.shape[0], dc * m), scat, precision=prec
        )

    def update(cv, weighted_in):
        total = colsum(cv) + weighted_in
        # gather totals back to edges: (B, n) @ (n, E)
        at_edges = jnp.matmul(total, gath, precision=prec)
        vc = at_edges.reshape(cv.shape) - cv
        if variant == "NMS-r":
            return _check_update_neural_edge(vc, real, params)
        return _check_update_minsum_edge(vc, real, w_chk)

    def soft_of(cv, llr):
        return colsum(cv) + w_marg * llr

    return update, soft_of, (m, dc), w_vc


def decode_edge_xla(params, h_host, llr, num_iterations, variant="NMS-1",
                    mode="highest"):
    """(T+1, B, n) per-iteration soft outputs (slot 0 = channel input),
    matching ``nms.decode``'s contract on the edge layout."""
    update, soft_of, (m, dc), w_vc = _build(params, h_host, variant, mode)
    weighted_in = w_vc * llr

    def body(cv, _):
        cv_new = update(cv, weighted_in)
        return cv_new, soft_of(cv_new, llr)

    cv0 = jnp.zeros((llr.shape[0], dc, m), llr.dtype)
    _, softs = jax.lax.scan(body, cv0, None, length=num_iterations)
    return jnp.concatenate([llr[None], softs], axis=0)


def decode_final_edge_xla(params, h_host, llr, num_iterations,
                          variant="NMS-1", mode="highest"):
    """Last-iteration soft output (B, n) only — the MC fast path, matching
    ``nms.decode_final`` (one scatter matmul after the scan instead of one
    per iteration)."""
    update, soft_of, (m, dc), w_vc = _build(params, h_host, variant, mode)
    weighted_in = w_vc * llr

    def body(cv, _):
        return update(cv, weighted_in), None

    cv0 = jnp.zeros((llr.shape[0], dc, m), llr.dtype)
    cv, _ = jax.lax.scan(body, cv0, None, length=num_iterations)
    return soft_of(cv, llr)
