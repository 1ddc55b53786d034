"""VMEM-resident Pallas kernel for the batched GF(2) elimination.

The XLA version (``gf2ops.batched_row_reduce``) round-trips the ``[B, m, n]``
work matrix through HBM on every one of its m pivot steps.  This kernel keeps
a frame block's matrices (and column-order vectors) in VMEM for the whole
elimination; per step it does only masked selects, first-index min-reductions
and one elementwise XOR — the same select-based semantics as the XLA path
(bit-exact, see tests/test_gf2_pallas.py).

Everything is f32 internally (0/1 values and small integers are exact);
argmax is replaced by min-over-masked-iota so no unsupported primitives are
used.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIGI = 1e9


def _kernel(m: int, n: int, h_ref, out_mat_ref, out_ord_ref, mat_ref, ord_ref):
    bt = mat_ref.shape[0]
    mat_ref[:] = h_ref[:]
    # int iota + cast: Mosaic's tpu.iota only produces integer vectors
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (bt, m), 1).astype(jnp.float32)
    ord_ref[:] = lane

    def step(t, carry):
        mat = mat_ref[:]
        col_order = ord_ref[:]
        tf = t.astype(jnp.float32)
        oh_t_col = (lane == tf).astype(jnp.float32)  # (bt, n)
        oh_t_row = (sub == tf).astype(jnp.float32)  # (bt, m)

        col_t = jnp.sum(mat * oh_t_col[:, None, :], axis=2)  # (bt, m)
        valid = sub >= tf
        col_masked = jnp.where(valid, col_t, 0.0)
        has_pivot = jnp.max(col_masked, axis=1, keepdims=True) > 0.5  # (bt,1)
        pivot_row = jnp.min(
            jnp.where(col_masked > 0.5, sub, _BIGI), axis=1, keepdims=True
        )  # first 1 in rows t..

        row_t = jnp.sum(mat * oh_t_row[:, :, None], axis=1)  # (bt, n)
        right = lane > tf
        swap_col = jnp.min(
            jnp.where(jnp.logical_and(right, row_t > 0.5), lane, _BIGI),
            axis=1,
            keepdims=True,
        )
        swap_col = jnp.where(has_pivot, tf, swap_col)  # (bt, 1)

        # --- column swap t <-> swap_col ---
        oh_s_col = (lane == swap_col).astype(jnp.float32)  # (bt, n)
        s_col_vals = jnp.sum(mat * oh_s_col[:, None, :], axis=2)  # (bt, m)
        t_col_vals = col_t
        mat = (
            mat
            + oh_t_col[:, None, :] * (s_col_vals - t_col_vals)[:, :, None]
            + oh_s_col[:, None, :] * (t_col_vals - s_col_vals)[:, :, None]
        )
        ord_t = jnp.sum(col_order * oh_t_col, axis=1, keepdims=True)
        ord_s = jnp.sum(col_order * oh_s_col, axis=1, keepdims=True)
        col_order = (
            col_order + oh_t_col * (ord_s - ord_t) + oh_s_col * (ord_t - ord_s)
        )

        # --- row swap t <-> pivot_row (t when column was swapped in) ---
        pr = jnp.where(has_pivot, pivot_row, tf)  # (bt, 1)
        oh_p_row = (sub == pr).astype(jnp.float32)  # (bt, m)
        p_row_vals = jnp.sum(mat * oh_p_row[:, :, None], axis=1)  # (bt, n)
        t_row_vals = jnp.sum(mat * oh_t_row[:, :, None], axis=1)
        mat = (
            mat
            + oh_t_row[:, :, None] * (p_row_vals - t_row_vals)[:, None, :]
            + oh_p_row[:, :, None] * (t_row_vals - p_row_vals)[:, None, :]
        )

        # --- eliminate column t except at row t ---
        pivot_vec = jnp.sum(mat * oh_t_row[:, :, None], axis=1)  # (bt, n)
        col_vec = jnp.sum(mat * oh_t_col[:, None, :], axis=2)  # (bt, m)
        col_vec = col_vec * (1.0 - oh_t_row)
        u = col_vec[:, :, None] * pivot_vec[:, None, :]
        mat = mat + u - 2.0 * mat * u  # xor
        mat_ref[:] = mat
        ord_ref[:] = col_order
        return carry

    jax.lax.fori_loop(0, m, step, 0, unroll=False)
    out_mat_ref[:] = mat_ref[:]
    out_ord_ref[:] = ord_ref[:]


@functools.partial(jax.jit, static_argnames=("block_frames", "interpret"))
def batched_row_reduce_pallas(
    h_batch: jnp.ndarray, block_frames: int = 16, interpret: bool = False
):
    """Drop-in replacement for ``gf2ops.batched_row_reduce`` on TPU.

    Requires batch % block_frames == 0 (pad upstream)."""
    batch, m, n = h_batch.shape
    if batch % block_frames:
        raise ValueError(f"batch {batch} not a multiple of {block_frames}")
    grid = (batch // block_frames,)
    kernel = functools.partial(_kernel, m, n)
    mat, order = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_frames, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (block_frames, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_frames, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, m, n), jnp.float32),
            jax.ShapeDtypeStruct((batch, n), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_frames, m, n), jnp.float32),
            pltpu.VMEM((block_frames, n), jnp.float32),
        ],
        interpret=interpret,
    )(h_batch.astype(jnp.float32))
    return mat.astype(jnp.int8), order.astype(jnp.int32)
