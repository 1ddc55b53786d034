"""Batched normalized-min-sum (NMS) belief-propagation decoding.

TPU-first redesign of the reference decoder
(``Ldpc_128_training/ms_decoder_dense.py:65-241``): the TF ``tf.while_loop``
over a dense ``[B, m, n]`` message tensor becomes a ``lax.scan`` over a fixed
iteration count, fully fused by XLA.  Min/submin per check row uses a
two-pass masked reduction instead of ``top_k`` (cheaper on the VPU), with
identical semantics including duplicate-minimum handling.

Variants (weights all pass through softplus, init -0.048 ~ softplus 0.67,
``ms_decoder_dense.py:66,74-90``):

* ``NMS-1``: one shared check-node normalization scalar.
* ``NMS-2``: + one shared bit scalar (applied to the channel LLR both in the
  variable-node update and the marginalization).
* ``NMS-3``: two bit scalars (separate for vc-update and marginalization)
  plus the check scalar.
* ``NMS-r``: check-node magnitude computed by a tiny non-negative 2-layer NN
  over the sorted magnitudes of the other row entries
  (``ms_decoder_dense.py:143-175``); bit scalars as NMS-3.

All functions are pure and jit/vmap/pjit-compatible; parameters are a flat
dict pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

VARIANTS = ("NMS-1", "NMS-2", "NMS-3", "NMS-r", "ENMS")

_INIT = -0.048
_CLIP = 1e30


def edge_columns(h: np.ndarray) -> np.ndarray:
    """Static per-check edge column indices, shape (m, dc_max).

    Requires a regular check degree (true for the CCSDS code, dc=8); used by
    the NMS-r neural check-node update."""
    rows = [np.flatnonzero(r) for r in np.asarray(h)]
    dc = max(len(r) for r in rows)
    if any(len(r) != dc for r in rows):
        raise ValueError("NMS-r requires a regular check degree")
    return np.stack(rows).astype(np.int32)


def init_params(variant: str, h: np.ndarray | None = None, seed: int = 0) -> dict:
    """Initial parameter pytree for a decoder variant."""
    if variant in ("NMS-1", "ENMS"):
        return {"check": jnp.array([_INIT], jnp.float32)}
    if variant == "NMS-2":
        return {
            "check": jnp.array([_INIT], jnp.float32),
            "bit": jnp.array([_INIT], jnp.float32),
        }
    if variant == "NMS-3":
        return {
            "check": jnp.array([_INIT], jnp.float32),
            "bit1": jnp.array([_INIT], jnp.float32),
            "bit2": jnp.array([_INIT], jnp.float32),
        }
    if variant == "NMS-r":
        dc = int(np.asarray(h).sum(axis=1).max())
        rng = np.random.default_rng(seed)
        limit1 = np.sqrt(6.0 / (dc - 1 + 4))
        limit2 = np.sqrt(6.0 / (4 + 1))
        return {
            "bit1": jnp.array([_INIT], jnp.float32),
            "bit2": jnp.array([_INIT], jnp.float32),
            # non-negativity enforced by projection after optimizer updates
            "nn_w1": jnp.abs(
                jnp.asarray(rng.uniform(-limit1, limit1, (dc - 1, 4)), jnp.float32)
            ),
            "nn_w2": jnp.abs(
                jnp.asarray(rng.uniform(-limit2, limit2, (4, 1)), jnp.float32)
            ),
        }
    raise ValueError(f"unknown NMS variant {variant!r}")


def _weights(params: dict, variant: str):
    """(w_vc, w_chk, w_marg) effective multipliers for a variant."""
    one = jnp.float32(1.0)
    sp = jax.nn.softplus
    if variant in ("NMS-1", "ENMS"):
        return one, sp(params["check"][0]), one
    if variant == "NMS-2":
        wb = sp(params["bit"][0])
        return wb, sp(params["check"][0]), wb
    if variant == "NMS-3":
        return sp(params["bit1"][0]), sp(params["check"][0]), sp(params["bit2"][0])
    if variant == "NMS-r":
        return sp(params["bit1"][0]), None, sp(params["bit2"][0])
    raise ValueError(variant)


def _row_sign_parity(vc: jnp.ndarray, h: jnp.ndarray):
    """(row_sign, edge_sign): product of edge signs per row via negative-count
    parity instead of ``sign``+``prod`` (the latter SIGSEGVs the Mosaic TPU
    compiler in this toolchain; parity is also cheaper).  Zero-valued edges
    zero the whole row product, matching ``tf.sign`` semantics."""
    edge = h > 0
    neg = jnp.logical_and(vc < 0.0, edge)
    negcount = jnp.sum(neg.astype(jnp.float32), axis=-1, keepdims=True)
    parity = negcount - 2.0 * jnp.floor(negcount * 0.5)
    anyzero = jnp.any(jnp.logical_and(vc == 0.0, edge), axis=-1, keepdims=True)
    row_sign = jnp.where(anyzero, 0.0, 1.0 - 2.0 * parity)
    own = jnp.where(vc > 0.0, 1.0, jnp.where(vc < 0.0, -1.0, 0.0))
    # own^2 == 1 on nonzero edges, so row_sign * own = product of the others
    return row_sign, row_sign * own * h


def _check_update_minsum(vc: jnp.ndarray, h: jnp.ndarray, w_chk) -> jnp.ndarray:
    """Min-sum check-node update with normalization on a dense masked tensor.

    Exact semantics of ``compute_cv2`` (``ms_decoder_dense.py:177-207``): the
    magnitude sent on each edge is the row minimum over the *other* edges
    (min for non-argmin edges, submin for the argmin edge); the sign is the
    product of the other edges' signs, excluded from gradients."""
    _, edge_sign = _row_sign_parity(vc, h)

    mag = jnp.clip(jnp.abs(vc), 0.0, _CLIP)
    masked = jnp.where(h > 0, mag, jnp.inf)
    min1 = jnp.min(masked, axis=-1, keepdims=True)
    arg1 = jnp.argmin(masked, axis=-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, masked.shape, masked.ndim - 1)
    not_first_min = cols != arg1[..., None]
    min2 = jnp.min(jnp.where(not_first_min, masked, jnp.inf), axis=-1, keepdims=True)
    edge_mag = jnp.where(mag > min1, min1, min2) * h
    return w_chk * edge_mag * jax.lax.stop_gradient(edge_sign)


def _check_update_neural(
    vc: jnp.ndarray, h: jnp.ndarray, params: dict, edge_cols: jnp.ndarray
) -> jnp.ndarray:
    """NMS-r neural check-node magnitude (``ms_decoder_dense.py:143-175``).

    For each edge, the magnitudes of the other dc-1 edges of its check row are
    sorted ascending and passed through a non-negative 2-layer linear NN."""
    m, dc = edge_cols.shape
    _, edge_sign = _row_sign_parity(vc, h)

    compact = jnp.abs(jnp.take_along_axis(vc, edge_cols[None], axis=-1))  # [B,m,dc]
    loo_idx = np.stack(
        [[q for q in range(dc) if q != p] for p in range(dc)]
    )  # [dc, dc-1]
    loo = compact[:, :, loo_idx]  # [B, m, dc, dc-1]
    loo = jnp.sort(loo, axis=-1)
    hidden = loo @ params["nn_w1"]  # [B, m, dc, 4]
    mags = (hidden @ params["nn_w2"])[..., 0]  # [B, m, dc]
    batch = vc.shape[0]
    dense = jnp.zeros_like(vc)
    rows = np.arange(m)[:, None]
    dense = dense.at[:, rows, np.asarray(edge_cols)].set(mags)
    del batch
    return dense * jax.lax.stop_gradient(edge_sign)


def decode(
    params: dict,
    h: jnp.ndarray,
    llr: jnp.ndarray,
    num_iterations: int,
    variant: str = "NMS-1",
    edge_cols: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Run NMS BP for a fixed number of iterations.

    Args:
      params: parameter pytree from ``init_params``.
      h: (m, n) parity-check matrix as float32 0/1.
      llr: (B, n) channel LLR proxies (positive ~ bit 0).
      num_iterations: static iteration count T.
      variant: one of ``VARIANTS``.
      edge_cols: (m, dc) static edge indices, required for NMS-r.

    Returns:
      (T+1, B, n) per-iteration soft outputs; slot 0 is the channel input
      (matching the reference's ``soft_output_list``).
    """
    w_vc, w_chk, w_marg = _weights(params, variant)
    h = h.astype(jnp.float32)
    weighted_in = (w_vc * llr)[:, None, :]

    def step(cv, _):
        total = jnp.sum(cv, axis=1)[:, None, :] + weighted_in
        vc = total * h - cv
        if variant == "NMS-r":
            cv_new = _check_update_neural(vc, h, params, edge_cols)
        else:
            cv_new = _check_update_minsum(vc, h, w_chk)
        soft = jnp.sum(cv_new, axis=1) + w_marg * llr
        return cv_new, soft

    cv0 = jnp.zeros((llr.shape[0],) + h.shape, llr.dtype)
    _, softs = jax.lax.scan(step, cv0, None, length=num_iterations)
    return jnp.concatenate([llr[None], softs], axis=0)


def decode_final(
    params: dict,
    h: jnp.ndarray,
    llr: jnp.ndarray,
    num_iterations: int,
    variant: str = "NMS-1",
    edge_cols: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Like :func:`decode` but returns only the last-iteration soft output
    (B, n) — avoids materializing the (T+1, B, n) trajectory stack in HBM on
    the Monte-Carlo fast path."""
    w_vc, w_chk, w_marg = _weights(params, variant)
    h = h.astype(jnp.float32)
    weighted_in = (w_vc * llr)[:, None, :]

    def step(cv, _):
        total = jnp.sum(cv, axis=1)[:, None, :] + weighted_in
        vc = total * h - cv
        if variant == "NMS-r":
            cv_new = _check_update_neural(vc, h, params, edge_cols)
        else:
            cv_new = _check_update_minsum(vc, h, w_chk)
        return cv_new, None

    cv0 = jnp.zeros((llr.shape[0],) + h.shape, llr.dtype)
    cv, _ = jax.lax.scan(step, cv0, None, length=num_iterations)
    return jnp.sum(cv, axis=1) + w_marg * llr


def multi_iteration_loss(soft_outputs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Sum over iterations 1..T of sigmoid cross entropy with logits
    ``-soft_output`` (``ms_decoder_dense.py:210-214``)."""
    logits = -soft_outputs[1:]
    z = labels[None].astype(logits.dtype)
    ce = jnp.maximum(logits, 0.0) - logits * z + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(ce)


def frame_stats(soft_last: jnp.ndarray, labels: jnp.ndarray, h: jnp.ndarray) -> dict:
    """Per-batch decoding statistics matching ``ms_test.py:36-54``.

    * ``frame_error``: any bit mismatch vs the transmitted codeword.
    * ``detected_failure``: nonzero syndrome (these frames go to OSD).
    * ``undetected_error``: zero syndrome but wrong codeword (counted as UFER,
      excluded from the OSD failure set).
    """
    hard = (soft_last < 0).astype(jnp.float32)
    err = hard != labels.astype(jnp.float32)
    frame_error = jnp.any(err, axis=-1)
    bit_errors = jnp.sum(err, axis=-1)
    synd = hard @ h.astype(jnp.float32).T
    synd = synd - 2.0 * jnp.floor(synd * 0.5)
    qualified = jnp.all(synd == 0.0, axis=-1)
    return {
        "frame_error": frame_error,
        "bit_errors": bit_errors,
        "detected_failure": jnp.logical_not(qualified),
        "undetected_error": jnp.logical_and(qualified, frame_error),
    }
