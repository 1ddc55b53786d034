"""Fused TEP-discrepancy kernel: MXU parity matmul + mod2 + weighted
m-reduction in VMEM.

The OSD minima stage's cost is NOT its FLOPs (~43 GFLOP at the learned-path
operating point -> ~0.2 ms at bf16 peak) but the HBM round-trip of the
``(B, m, N)`` parity intermediate ``a = mod2(M @ T^T)``: the XLA path
(``engine._block_disc_scan``) materializes ~0.5 GB per 512-TEP chunk and
reads it back for the ``u_l`` reduction — ~1.6 GB of traffic, 2.3 ms
measured at B=4096 (r4 attribution).  XLA cannot fuse matmul -> nonlinear
mod2 -> matvec; this Pallas kernel tiles the computation so the
intermediate lives only in VMEM:

    lterm[b, t] = sum_m u_l[b, m] * mod2( sum_k M[b, m, k] * T[t, k] )

per (Bb-frame, Nb-TEP) grid cell: one MXU ``dot_general`` over k (bf16
operands are 0/1 so products are exact; f32 accumulation holds row sums
<= k < 2^24 exactly), the mod2 on the VPU, and the f32 ``u_l`` reduction —
only the (B, Ntot) result is written to HBM.

The full discrepancy is assembled by the caller as
``disc = c0 + lterm + u_m @ T^T`` (both extra terms are (B, Ntot)-cheap).
Float semantics match the XLA path to reduction-order noise (~1e-6
relative); the walk-parity suite re-validates the production walk against
the reference after this change (docs/REFPARITY.md §6).

Ref: ``DL_OSD_Testing_serial/ordered_statistics_decoding.py:153-162``
(``acquire_min``) is the semantics being accelerated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _lterm_kernel(m_ref, ul_ref, t_ref, out_ref, *, bb, m, k_pad, nb):
    mm = m_ref[:].reshape(bb * m, k_pad)
    # contract k with k (no explicit transpose of T)
    prods = jax.lax.dot_general(
        mm, t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bb*m, nb), exact integers <= k
    a = prods - 2.0 * jnp.floor(prods * 0.5)  # 0/1 parity
    a = a.reshape(bb, m, nb)
    out_ref[:] = jnp.sum(ul_ref[:][:, :, None] * a, axis=1)


def auto_frame_block(m: int, nb: int = 512, vmem_budget: int = 4 * 2**20) -> int:
    """Frames per grid cell.  The budget covers the (bb*m, nb) f32 prods
    tile only; the ``a`` intermediate, reshape copy and operand tiles are
    roughly another 1.5x, so the budget is set to ~1/4 of scoped VMEM —
    and the caller (engine.make_dl_osd_step) still guards the compile at
    the host level, since this model is calibrated, not exact."""
    # multiple of 8: the (bb, m)/(bb, nb) block shapes must be sublane-
    # divisible (Mosaic rejects e.g. bb=10 for the m=192 wimaxlike code)
    bb = max(8, (vmem_budget // (m * nb * 4)) // 8 * 8)
    return min(bb, 32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lterm_pallas(
    m_matrix: jnp.ndarray,  # (B, m, k) 0/1
    u_l: jnp.ndarray,  # (B, m) f32
    teps_flat: jnp.ndarray,  # (Ntot, k) 0/1
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, Ntot) f32 ``sum_m u_l * mod2(M @ T^T)`` without the HBM
    intermediate.  Pads B/Ntot/k internally (zero TEP columns and zero
    frames contribute zeros — exact)."""
    b, m, k = m_matrix.shape
    ntot = teps_flat.shape[0]
    nb = 512
    k_pad = -(-k // 128) * 128
    bb = auto_frame_block(m, nb)
    b_pad = -(-b // bb) * bb
    n_pad = -(-ntot // nb) * nb
    mm = jnp.zeros((b_pad, m, k_pad), jnp.bfloat16)
    mm = mm.at[:b, :, :k].set(m_matrix.astype(jnp.bfloat16))
    ul = jnp.zeros((b_pad, m), jnp.float32)
    ul = ul.at[:b].set(u_l.astype(jnp.float32))
    tt = jnp.zeros((n_pad, k_pad), jnp.bfloat16)
    tt = tt.at[:ntot, :k].set(teps_flat.astype(jnp.bfloat16))

    out = pl.pallas_call(
        functools.partial(_lterm_kernel, bb=bb, m=m, k_pad=k_pad, nb=nb),
        grid=(b_pad // bb, n_pad // nb),
        in_specs=[
            pl.BlockSpec((bb, m, k_pad), lambda bi, nj: (bi, 0, 0)),
            pl.BlockSpec((bb, m), lambda bi, nj: (bi, 0)),
            pl.BlockSpec((nb, k_pad), lambda bi, nj: (nj, 0)),
        ],
        out_specs=pl.BlockSpec((bb, nb), lambda bi, nj: (bi, nj)),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(mm, ul, tt)
    return out[:b, :ntot]


def lterm_reference(m_matrix, u_l, teps_flat):
    """XLA reference of :func:`lterm_pallas` (materializes the (B, m, Ntot)
    intermediate — test oracle and non-TPU fallback shape)."""
    prods = jnp.einsum(
        "bmk,nk->bmn", m_matrix.astype(jnp.bfloat16),
        teps_flat.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
    )
    a = prods - 2.0 * jnp.floor(prods * 0.5)
    return jnp.einsum("bm,bmn->bn", u_l, a,
                      precision=jax.lax.Precision.HIGHEST)
