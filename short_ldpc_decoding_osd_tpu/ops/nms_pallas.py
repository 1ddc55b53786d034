"""Fused Pallas TPU kernel for NMS decoding.

The XLA scan path (``ops.nms``) round-trips the ``[B, m, n]`` message tensor
through HBM every iteration.  This kernel keeps the check-to-variable
messages in a VMEM scratch buffer for all T iterations — HBM traffic drops to
just the channel LLRs in and the final soft outputs out (a ~100x byte
reduction for T=12), leaving the kernel VPU-bound.

Semantics are identical to ``nms.decode_final`` for the scalar-normalization
variants (NMS-1/2/3, ENMS); duplicates-at-the-minimum are handled without an
argmin (Mosaic-friendly):

  min2_effective(edge) = min1                   if edge mag > min1
                       = min1                   if the min is duplicated
                       = strict second minimum  otherwise

which equals the reference top-k(2) rule (``ms_decoder_dense.py:196-203``).
The sign product is the parity of the negative-edge count (zeros zero the
whole row), as in ``ops.nms._row_sign_parity``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38


def auto_block_frames(m: int, n: int, vmem_bytes: int = 16 * 2**20,
                      live_copies: int = 12) -> int:
    """Largest power-of-two frame block whose ~``live_copies`` [block, m, n]
    f32 temporaries fit the scoped-VMEM limit.  Returns 0 when even a
    2-frame block does not fit (caller should fall back to the XLA path)."""
    per_frame = m * n * 4 * live_copies
    block = 1
    while block * 2 * per_frame <= vmem_bytes and block < 64:
        block *= 2
    return 0 if block < 2 else block


def _kernel(num_iterations: int, weights_ref, h_ref, llr_ref, out_ref, cv_ref):
    w_vc = weights_ref[0]
    w_chk = weights_ref[1]
    w_marg = weights_ref[2]
    h = h_ref[:]  # (m, n)
    llr = llr_ref[:]  # (bt, n)
    edge = h > 0.0
    weighted_in = (w_vc * llr)[:, None, :]
    cv_ref[:] = jnp.zeros_like(cv_ref)

    def body(_, carry):
        cv = cv_ref[:]
        total = jnp.sum(cv, axis=1)[:, None, :] + weighted_in
        vc = total * h - cv
        # sign: parity of negative edges; zero edges zero the row product
        neg = jnp.logical_and(vc < 0.0, edge)
        negcount = jnp.sum(neg.astype(jnp.float32), axis=-1, keepdims=True)
        parity = negcount - 2.0 * jnp.floor(negcount * 0.5)
        anyzero = jnp.any(
            jnp.logical_and(vc == 0.0, edge), axis=-1, keepdims=True
        )
        row_sign = jnp.where(anyzero, 0.0, 1.0 - 2.0 * parity)
        own = jnp.where(vc > 0.0, 1.0, jnp.where(vc < 0.0, -1.0, 0.0))
        edge_sign = row_sign * own * h
        # min / effective-submin without argmin
        mag = jnp.minimum(jnp.abs(vc), _BIG)
        masked = jnp.where(edge, mag, _BIG)
        min1 = jnp.min(masked, axis=-1, keepdims=True)
        is_min = jnp.logical_and(masked <= min1, edge)
        dup = jnp.sum(is_min.astype(jnp.float32), axis=-1, keepdims=True) > 1.5
        strict2 = jnp.min(jnp.where(masked > min1, masked, _BIG), axis=-1, keepdims=True)
        min2 = jnp.where(dup, min1, strict2)
        emag = jnp.where(mag > min1, min1, min2) * h
        cv_ref[:] = w_chk * emag * edge_sign
        return carry

    jax.lax.fori_loop(0, num_iterations, body, 0, unroll=False)
    out_ref[:] = jnp.sum(cv_ref[:], axis=1) + w_marg * llr


@functools.partial(
    jax.jit, static_argnames=("num_iterations", "variant", "block_frames", "interpret")
)
def decode_final_pallas(
    params: dict,
    h: jnp.ndarray,
    llr: jnp.ndarray,
    num_iterations: int,
    variant: str = "NMS-1",
    block_frames: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Final-iteration soft outputs (B, n) via the fused VMEM kernel.

    Supports the scalar-normalization variants; B must be a multiple of
    ``block_frames``.  VMEM bound: the iteration body keeps ~8 live
    ``[block, m, n]`` f32 temporaries plus the scratch, so
    ``block_frames * m * n * 4 * ~9`` must stay under the ~16 MB scoped VMEM
    — for the (128,64) code that caps block_frames at ~48 (32 is the sweet
    spot measured on v5e; 128 OOMs)."""
    if variant == "NMS-r":
        raise ValueError("NMS-r uses the XLA path (neural check update)")
    from .nms import _weights

    w_vc, w_chk, w_marg = _weights(params, variant)
    weights = jnp.stack([w_vc, w_chk, w_marg]).astype(jnp.float32)
    batch, n = llr.shape
    m = h.shape[0]
    if batch % block_frames:
        raise ValueError(f"batch {batch} not a multiple of {block_frames}")
    grid = (batch // block_frames,)
    kernel = functools.partial(_kernel, num_iterations)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # weights (3,)
            pl.BlockSpec((m, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_frames, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_frames, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_frames, m, n), jnp.float32)],
        interpret=interpret,
    )(weights, h.astype(jnp.float32), llr.astype(jnp.float32))
