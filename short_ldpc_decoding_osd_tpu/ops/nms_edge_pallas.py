"""Edge-compact Pallas NMS kernels: check-centric layout + MXU scatter/gather.

The dense kernels (``nms_pallas`` / ``mc_pallas``) spend their VPU cycles on
the full ``[B, m, n]`` masked tensor even though only ``m*dc`` entries are
real edges — a 16x lane waste for the (128,64) code (64x128 mask, row degree
8).  Here the check-to-variable messages live as ``dc`` slabs of shape
``(block, m)``; the variable dimension appears only in two batched matmuls
per iteration against constant one-hot edge-incidence matrices:

  scatter:  colsum[b, v] = (cv_flat @ S)[b, v]    S: (dc*m, n) stacked
  gather:   g_flat[b, :] = (total @ G)[b, :]      G: (n, dc*m) stacked

which the MXU does essentially for free.  Per-iteration VPU element work
drops ~30x vs the dense kernels.  The dc per-slab incidence matmuls are
STACKED along the contraction/output dimension into a single matmul each
(K = dc*m for scatter, N = dc*m for gather): with m = 64 the per-slab
shapes only half-fill the 128-deep systolic array and pay dc separate
issue latencies; the stacked form runs full-depth with one issue per
direction per iteration (measured 1.3-1.5x on v5e).  The cv messages live
as one (block, dc*m) VMEM slab; per-edge views are static lane slices.

The math is identical to ``ops.nms.decode_final`` (reference
``ms_decoder_dense.py:121-134,177-207``): min/submin with the
duplicate-at-the-minimum rule via a two-register tournament, sign product
with zero semantics via an explicit multiply chain (``jnp.sign``+``prod``
SIGSEGVs this Mosaic toolchain, see ops/nms.py).  Only the float accumulation
*order* differs (matmul reduction trees vs dense row sums), so soft outputs
agree to f32 rounding rather than bit-exactly; the dense kernels remain the
bit-exact reference (tests/test_nms_edge.py checks tolerance + hard-decision
equivalence + FER statistics).

Irregular check degrees are handled with dummy edges: a ``+_BIAS`` offset
makes the padded edge's magnitude huge and its sign positive, so it never
wins the minimum and never flips the row sign; its one-hot rows are zero so
it scatters nothing back.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mc_pallas import _sample_msg_and_normals

_BIAS = 1e30
_TWO_PI = 6.283185307179586


@functools.lru_cache(maxsize=16)
def _edge_layout_cached(h_bytes: bytes, m: int, n: int):
    h = np.frombuffer(h_bytes, dtype=np.uint8).reshape(m, n)
    dc = int(h.sum(axis=1).max())
    if dc < 2:
        # a degree-1 check row has no extrinsic message (and the min/submin
        # tournament in _decode_edge would have no second operand)
        raise ValueError(
            f"edge kernels need max check degree >= 2, got dc={dc}; "
            "use the XLA decoder for degenerate codes"
        )
    scatter = np.zeros((dc, m, n), np.float32)
    gather = np.zeros((dc, n, m), np.float32)
    bias = np.zeros((dc, 1, m), np.float32)
    for c in range(m):
        cols = np.nonzero(h[c])[0]
        for j in range(dc):
            if j < len(cols):
                scatter[j, c, cols[j]] = 1.0
                gather[j, cols[j], c] = 1.0
            else:
                bias[j, 0, c] = _BIAS
    # which slabs contain dummy edges (none for row-regular codes): slabs
    # with an all-zero bias can skip the bias add in the iteration body
    slab_has_dummy = tuple(bool(bias[j].any()) for j in range(dc))
    return scatter, gather, bias, slab_has_dummy


def edge_layout(h):
    """One-hot scatter/gather incidence matrices + dummy-edge bias for ``h``.

    Returns (scatter (dc,m,n), gather (dc,n,m), bias (dc,1,m),
    slab_has_dummy (dc,) bools) — f32 arrays."""
    h = np.asarray(h, dtype=np.uint8)
    return _edge_layout_cached(h.tobytes(), *h.shape)


@functools.lru_cache(maxsize=16)
def _edge_layout_stacked_cached(h_bytes: bytes, m: int, n: int):
    scatter, gather, bias, slab_has_dummy = _edge_layout_cached(h_bytes, m, n)
    dc = scatter.shape[0]
    scat = np.ascontiguousarray(scatter.reshape(dc * m, n))
    gath = np.ascontiguousarray(np.transpose(gather, (1, 0, 2)).reshape(n, dc * m))
    return scat, gath, np.ascontiguousarray(bias.reshape(1, dc * m)), slab_has_dummy


def edge_layout_stacked(h):
    """Stacked incidence forms for the single-matmul iteration body.

    Returns (scat (dc*m, n), gath (n, dc*m), bias (1, dc*m), slab_has_dummy):
    ``(cv_flat @ scat)`` is the column sum over all edges, and
    ``(total @ gath)[:, j*m:(j+1)*m]`` is slab ``j``'s per-edge column
    totals."""
    h = np.asarray(h, dtype=np.uint8)
    return _edge_layout_stacked_cached(h.tobytes(), *h.shape)


def auto_block_frames(m: int, n: int, dc: int, vmem_bytes: int = 16 * 2**20,
                      compact_frac: float | None = None) -> int:
    """Largest power-of-two frame block fitting scoped VMEM.

    Working-set model for the STACKED layout of ``_decode_edge``:

    * constants: scat ``(dc*m, n)`` + gath ``(n, dc*m)`` + bias, plus h and g
      for the fused-MC variant — ``(2*dc*m*n + 2*m*n)`` f32, DOUBLE-buffered:
      Mosaic allocates two buffers even for constant-index inputs (observed
      on v5e: the (512,256) dc=10 code, whose incidence constants alone are
      10.5 MiB, fails scoped-VMEM at every block size incl. 8);
    * per frame: the ``(block, dc*m)`` cv scratch plus llr/weighted-in/out
      rows (``dc*m + 3n`` f32), plus the per-chunk live set — vc/mag/sgn
      slabs (``3*dc*m``), the min/submin tournament registers
      (``(5+dc)*m``) and the column total (``n``) — amortised over the 2
      row chunks the body runs at ``block >= 128``;
    * a 2x factor on the block-sized part for pipeline double-buffering;
    * the fused-MC kernels' sampling/count temporaries — message bits,
      Box-Muller intermediates, codeword/llr/soft/syndrome rows — modeled
      as ``(7n + m)`` f32 per frame.  This term reproduces the two observed
      scoped-VMEM OOMs on v5e to ~0.2 MiB: the (512,256) dc=10 one-shot
      kernel at block 64 (17.51 MiB vs the 16 MiB limit) and the (256,128)
      dc=10 compact kernel at block 256 (16.15 MiB);
    * with ``compact_frac`` (convergence-compaction kernels): the sub-block
      cv scratch (``rows * dc*m`` f32) and the rank/one-hot maps, whose
      ``(block, block)`` tri matrix makes the requirement quadratic in the
      block;
    * a 1 MiB calibration margin.

    The cap of 512 is empirical, not a VMEM fit: larger blocks satisfy this
    estimate for small codes but fail Mosaic scheduling on v5e, and 512 is
    also the measured throughput peak.  (For CCSDS (128,64) the model itself
    also tops out at 512.)  Returns 0 if even 8 frames don't fit."""
    const = (2 * dc * m * n + 2 * m * n) * 4 * 2  # x2: Mosaic double-buffers
    per_chunk_live = ((3 * dc + 5 + dc) * m + n) * 4 // 2
    per_frame = (dc * m + 3 * n) * 4 + per_chunk_live

    def fits(b: int) -> bool:
        need = b * 2 * per_frame + const
        need += b * (7 * n + m) * 4  # MC sampling/count temporaries
        if compact_frac:
            rows = max(64, int(b * compact_frac))
            need += rows * dc * m * 4  # sub-block cv scratch
            need += b * (b + rows) * 4  # tri rank matrix + one-hot map
        return need + 2**20 <= vmem_bytes

    block = 8
    while block < 512 and fits(block * 2):
        block *= 2
    return 0 if not fits(block) else block


def _decode_edge(dc, num_iterations, w_vc, w_chk, llr, scat_ref, gath_ref,
                 bias_ref, cv_ref, mode="split", slab_has_dummy=None,
                 init_cv=True, traj_ref=None, w_marg=None):
    """Shared iteration body; returns the final column sums (block, n).

    ``traj_ref``: optional (T+1, block, n) VMEM ref — per-iteration soft
    outputs in the ``nms.decode`` convention (slot 0 = channel input,
    slot t = colsum after t updates + w_marg*llr).  Costs NO extra matmul:
    slot t (1 <= t < T) is derived from the ``total`` the NEXT iteration
    computes anyway (colsum_t = total_t - w_vc*llr); only the final slot
    needs the closing scatter matmul the final-only path already does.

    Refs are the STACKED layout (``edge_layout_stacked``): scat (dc*m, n),
    gath (n, dc*m), bias (1, dc*m), cv scratch (block, dc*m) — one matmul
    per direction per iteration instead of dc small ones.

    The default TPU matmul truncates f32 operands to bf16, which corrupts the
    messages (~1e-2 relative per iteration).  Exactness modes:

    * ``"split"``: 2-pass bf16 hi/lo emulation — the one-hot incidence
      operand is bf16-exact, so only the message operand needs the split;
      error ~2^-17 relative per matmul, FER statistically identical to
      "highest".
    * ``"bf16"``: single-pass, messages truncated to 8 mantissa bits per
      matmul (~2^-9 relative per iteration).  Only acceptable because it is
      validated statistically against the split mode (see
      scripts/fer_mode_check.py and tests/test_nms_edge.py) — min-sum is
      tie-sensitive.
    * ``"highest"``: Precision.HIGHEST (6-pass) full-f32 matmuls; matches
      the XLA decoder to ~1e-5 after 12 iterations.
    """
    m = gath_ref.shape[1] // dc
    if mode == "split":
        scat = scat_ref[:].astype(jnp.bfloat16)
        gath = gath_ref[:].astype(jnp.bfloat16)

        def _dot(x, mat):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return jnp.dot(
                hi, mat, preferred_element_type=jnp.float32
            ) + jnp.dot(lo, mat, preferred_element_type=jnp.float32)

        dot_scat = lambda x: _dot(x, scat)
        dot_gath = lambda x: _dot(x, gath)
    elif mode == "bf16":
        scat = scat_ref[:].astype(jnp.bfloat16)
        gath = gath_ref[:].astype(jnp.bfloat16)
        dot_scat = lambda x: jnp.dot(
            x.astype(jnp.bfloat16), scat, preferred_element_type=jnp.float32)
        dot_gath = lambda x: jnp.dot(
            x.astype(jnp.bfloat16), gath, preferred_element_type=jnp.float32)
    else:
        _hi = functools.partial(
            jnp.dot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dot_scat = lambda x: _hi(x, scat_ref[:])
        dot_gath = lambda x: _hi(x, gath_ref[:])

    weighted_in = w_vc * llr
    if init_cv:
        cv_ref[:] = jnp.zeros_like(cv_ref)
    any_dummy = (any(slab_has_dummy) if slab_has_dummy is not None else True)
    block = llr.shape[0]
    # independent row-chunk chains inside one loop body: the scheduler can
    # overlap chunk A's VPU tournament with chunk B's matmuls (a single
    # chain leaves MXU and VPU each under-occupied).  With the lane-packed
    # tournament below, 2 chunks is the measured optimum on v5e at block 512
    # (24.5 M cw/s vs 24.1 at 4 chunks, 23.5 at 8, 12-iter compact MC)
    chunks = int(os.environ.get("SLDPC_EDGE_CHUNKS", "2"))
    if block % chunks or block < 64 * chunks:
        chunks = 2 if block % 2 == 0 and block >= 128 else 1
    half = block // chunks
    rows = [slice(c * half, (c + 1) * half) for c in range(chunks)]

    # lane packing: for codes with m < 128 the per-slab (rows, m) VPU ops
    # leave 128-m lanes idle, and the tournament/output chains are where the
    # kernel's VPU time goes (the MXU matmuls are ~1/3 of the iteration).
    # Process P adjacent slabs (lane width P*m) per op — P the largest power
    # of two with P*m <= 128 dividing dc — then fold the packed halves down
    # to per-check values with log2(P) half-width merges.  For CCSDS
    # (128,64) this halves the VPU slot count (measured 16.6 -> 21+ M cw/s
    # one-shot 12-iter on v5e).
    p = 1
    while p * 2 * m <= 128 and dc % (p * 2) == 0:
        p *= 2
    ngroups = dc // p
    w = p * m

    def _chunk_iter(cv, win):
        # ``total`` is also the previous iteration's colsum + w_vc*llr —
        # the trajectory store below reuses it (see traj_ref docstring)
        total = dot_scat(cv) + win
        vc = dot_gath(total) - cv
        if any_dummy:  # zero bias everywhere for row-regular codes: skip
            vc = vc + bias_ref[:]
        mag = jnp.abs(vc)
        sgn = jnp.where(vc > 0.0, 1.0, jnp.where(vc < 0.0, -1.0, 0.0))
        # min/submin tournament over the ngroups full-width lane slices;
        # update min2 with the old min1 BEFORE lowering min1 so a duplicated
        # minimum lands in min2 (the reference top-k rule, multiset
        # semantics)
        min1 = mag[:, :w]
        min2 = None
        sign_prod = sgn[:, :w]
        for g in range(1, ngroups):
            mg = mag[:, g * w:(g + 1) * w]
            mx = jnp.maximum(min1, mg)
            min2 = mx if min2 is None else jnp.minimum(min2, mx)
            min1 = jnp.minimum(min1, mg)
            sign_prod = sign_prod * sgn[:, g * w:(g + 1) * w]
        # fold the P packed slabs down to per-check width m; merging two
        # multisets' (min1, min2) keeps exact two-smallest semantics:
        # min2 = min(min2_a, min2_b, max(min1_a, min1_b))
        width = w
        while width > m:
            half = width // 2
            a1, b1 = min1[:, :half], min1[:, half:width]
            mx = jnp.maximum(a1, b1)
            if min2 is None:
                min2 = mx
            else:
                min2 = jnp.minimum(jnp.minimum(min2[:, :half],
                                               min2[:, half:width]), mx)
            min1 = jnp.minimum(a1, b1)
            sign_prod = sign_prod[:, :half] * sign_prod[:, half:width]
            width = half
        # hoist the normalization out of the per-group multiply chain and
        # broadcast the per-check values back to packed width
        wmin1 = w_chk * min1
        wmin2 = w_chk * min2
        if p > 1:
            min1 = jnp.concatenate([min1] * p, axis=1)
            wmin1 = jnp.concatenate([wmin1] * p, axis=1)
            wmin2 = jnp.concatenate([wmin2] * p, axis=1)
            sign_prod = jnp.concatenate([sign_prod] * p, axis=1)
        outs = []
        for g in range(ngroups):
            sl = slice(g * w, (g + 1) * w)
            emag = jnp.where(mag[:, sl] > min1, wmin1, wmin2)
            outs.append(emag * (sign_prod * sgn[:, sl]))
        return outs, total

    def body(j, carry):
        rets = [_chunk_iter(cv_ref[r, :], weighted_in[r, :]) for r in rows]
        if traj_ref is not None:
            # slot j = soft output after j updates (valid for j >= 1; slot 0
            # is the raw channel input, stored by the kernel wrapper)
            @pl.when(j > 0)
            def _store():
                for r, (_, total) in zip(rows, rets):
                    traj_ref[pl.ds(j, 1), r, :] = (
                        total - (w_vc - w_marg) * llr[r, :]
                    )[None]
        for r, (outs, _) in zip(rows, rets):
            for g in range(ngroups):
                cv_ref[r, g * w:(g + 1) * w] = outs[g]
        return carry

    jax.lax.fori_loop(0, num_iterations, body, 0, unroll=False)
    return jnp.concatenate([dot_scat(cv_ref[r, :]) for r in rows], axis=0) \
        if chunks > 1 else dot_scat(cv_ref[:])


def _decode_kernel(dc, num_iterations, mode, slab_has_dummy, weights_ref,
                   scat_ref, gath_ref, bias_ref, llr_ref, out_ref, cv_ref):
    llr = llr_ref[:]
    colsum = _decode_edge(dc, num_iterations, weights_ref[0], weights_ref[1],
                          llr, scat_ref, gath_ref, bias_ref, cv_ref, mode,
                          slab_has_dummy)
    out_ref[:] = colsum + weights_ref[2] * llr


def decode_final_edge(
    params: dict,
    h,
    llr: jnp.ndarray,
    num_iterations: int,
    variant: str = "NMS-1",
    block_frames: int = 256,
    interpret: bool = False,
    mode: str = "split",
) -> jnp.ndarray:
    """Final-iteration soft outputs (B, n); B % block_frames == 0.

    ``h`` must be a concrete (host) array — the edge layout is built at trace
    time.  Scalar-normalization variants only (as ``nms_pallas``).  ``mode``
    selects the matmul exactness ("split" default / "highest"), see
    ``_decode_edge``."""
    if variant == "NMS-r":
        raise ValueError("NMS-r uses the XLA path (neural check update)")
    scatter, gather, bias, slab_has_dummy = edge_layout_stacked(h)
    h_f32 = np.asarray(h, np.float32)
    return _decode_final_edge_jit(
        params, scatter, gather, bias, h_f32, llr, num_iterations, variant,
        block_frames, interpret, mode, slab_has_dummy,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_iterations", "variant", "block_frames", "interpret",
                     "mode", "slab_has_dummy"),
)
def _decode_final_edge_jit(params, scatter, gather, bias, h, llr,
                           num_iterations, variant, block_frames, interpret,
                           mode="split", slab_has_dummy=None):
    from .nms import _weights

    w_vc, w_chk, w_marg = _weights(params, variant)
    weights = jnp.stack([w_vc, w_chk, w_marg]).astype(jnp.float32)
    edges, n = scatter.shape
    m = h.shape[0]
    dc = edges // m
    batch = llr.shape[0]
    if batch % block_frames:
        raise ValueError(f"batch {batch} not a multiple of {block_frames}")
    grid = (batch // block_frames,)
    kernel = functools.partial(_decode_kernel, dc, num_iterations, mode,
                               slab_has_dummy)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # weights (3,)
            pl.BlockSpec((edges, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, edges), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, edges), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_frames, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_frames, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_frames, edges), jnp.float32)],
        interpret=interpret,
    )(weights, jnp.asarray(scatter), jnp.asarray(gather), jnp.asarray(bias),
      llr.astype(jnp.float32))


def _decode_traj_kernel(dc, num_iterations, mode, slab_has_dummy,
                        weights_ref, scat_ref, gath_ref, bias_ref, llr_ref,
                        out_ref, cv_ref):
    llr = llr_ref[:]
    out_ref[pl.ds(0, 1)] = llr[None]  # slot 0: channel input
    colsum = _decode_edge(
        dc, num_iterations, weights_ref[0], weights_ref[1], llr,
        scat_ref, gath_ref, bias_ref, cv_ref, mode, slab_has_dummy,
        traj_ref=out_ref, w_marg=weights_ref[2],
    )
    out_ref[pl.ds(num_iterations, 1)] = (
        colsum + weights_ref[2] * llr
    )[None]


def decode_traj_edge(
    params: dict,
    h,
    llr: jnp.ndarray,
    num_iterations: int,
    variant: str = "NMS-1",
    block_frames: int = 256,
    interpret: bool = False,
    mode: str = "highest",
) -> jnp.ndarray:
    """Per-iteration soft-output TRAJECTORIES (T+1, B, n) from the
    edge-compact VMEM kernel — the ``nms.decode`` convention at the edge
    kernel's speed.

    Exists for the two-phase system path: re-deriving captured failures'
    trajectories with the XLA dense decoder costs ~13 ms / 4096 frames on
    v5e (the (B, m, n) message tensor round-trips HBM every iteration)
    and dominated the fused phase-2 program (~36 ms/chunk, r5
    measurement); this kernel keeps the messages in VMEM and emits only
    the (T+1, B, n) result.  Default mode "highest" (full-f32 matmuls)
    because trajectories feed tie-sensitive OSD/stopper decisions —
    matches the XLA decoder to ~3e-5 after 12 iterations (tpu_smoke);
    the bit-exactness-bearing parity chains still use ``nms.decode``."""
    if variant == "NMS-r":
        raise ValueError("NMS-r uses the XLA path (neural check update)")
    scatter, gather, bias, slab_has_dummy = edge_layout_stacked(h)
    h_f32 = np.asarray(h, np.float32)
    return _decode_traj_edge_jit(
        params, scatter, gather, bias, h_f32, llr, num_iterations, variant,
        block_frames, interpret, mode, slab_has_dummy,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_iterations", "variant", "block_frames", "interpret",
                     "mode", "slab_has_dummy"),
)
def _decode_traj_edge_jit(params, scatter, gather, bias, h, llr,
                          num_iterations, variant, block_frames, interpret,
                          mode="highest", slab_has_dummy=None):
    from .nms import _weights

    w_vc, w_chk, w_marg = _weights(params, variant)
    weights = jnp.stack([w_vc, w_chk, w_marg]).astype(jnp.float32)
    edges, n = scatter.shape
    dc = edges // h.shape[0]
    batch = llr.shape[0]
    if batch % block_frames:
        raise ValueError(f"batch {batch} not a multiple of {block_frames}")
    grid = (batch // block_frames,)
    kernel = functools.partial(_decode_traj_kernel, dc, num_iterations, mode,
                               slab_has_dummy)
    t1 = num_iterations + 1
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # weights (3,)
            pl.BlockSpec((edges, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, edges), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, edges), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_frames, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t1, block_frames, n), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t1, batch, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_frames, edges), jnp.float32)],
        interpret=interpret,
    )(weights, jnp.asarray(scatter), jnp.asarray(gather), jnp.asarray(bias),
      llr.astype(jnp.float32))


def _mc_kernel(dc, num_iterations, mode, slab_has_dummy,
               seed_ref,  # SMEM int32 (1,) — exact (f32 rounds > 2^24, which
               # the sharded per-device seed striding reaches quickly)
               weights_ref,  # SMEM f32: [w_vc, w_chk, w_marg, sigma, mean]
               # (sigma/mean in SMEM: one compile serves every SNR point)
               scat_ref, gath_ref, bias_ref, h_ref, g_ref,
               out_ref,  # (1, 8, 128) counter tile (same layout as mc_pallas)
               cv_ref):
    sigma = weights_ref[3]
    mean = weights_ref[4]
    w_vc = weights_ref[0]
    w_chk = weights_ref[1]
    w_marg = weights_ref[2]
    h = h_ref[:]
    g = g_ref[:]
    k = g.shape[0]
    bt = cv_ref.shape[0]
    n = h.shape[1]
    # separate seed words (see mc_pallas): `seed + program_id` correlates
    # consecutive-seed runs (block j of seed s == block j-1 of seed s+1)
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    # --- sample (identical to mc_pallas._mc_kernel) ---
    msg, z = _sample_msg_and_normals(bt, n, k)
    prods = jnp.dot(msg, g, preferred_element_type=jnp.float32)
    codeword = prods - 2.0 * jnp.floor(prods * 0.5)
    received = mean + sigma * z
    llr = (1.0 - 2.0 * codeword) * received

    # --- decode (edge-compact) ---
    colsum = _decode_edge(dc, num_iterations, w_vc, w_chk, llr,
                          scat_ref, gath_ref, bias_ref, cv_ref, mode,
                          slab_has_dummy)
    soft = colsum + w_marg * llr

    # --- count (identical to mc_pallas._mc_kernel) ---
    hard = (soft < 0.0).astype(jnp.float32)
    err = jnp.abs(hard - codeword)
    frame_err = jnp.max(err, axis=1, keepdims=True)
    bit_err = jnp.sum(err)
    synd = jnp.dot(hard, h.T, preferred_element_type=jnp.float32)
    synd = synd - 2.0 * jnp.floor(synd * 0.5)
    detected = jnp.max(synd, axis=1, keepdims=True)
    undetected = jnp.maximum(frame_err - detected, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    vals = (
        jnp.where(lane == 0, jnp.float32(bt), 0.0)
        + jnp.where(lane == 1, jnp.sum(frame_err), 0.0)
        + jnp.where(lane == 2, bit_err, 0.0)
        + jnp.where(lane == 3, jnp.sum(detected), 0.0)
        + jnp.where(lane == 4, jnp.sum(undetected), 0.0)
    )
    out_ref[:] = jnp.where(row == 0, vals, 0.0)


def mc_fused_edge(
    weights_vec: jnp.ndarray,  # [w_vc, w_chk, w_marg] float32
    seed,  # int32 scalar/array (may be traced, e.g. a shard_map shard)
    h,
    g,
    num_iterations: int,
    batch: int,
    sigma: float,
    mean: float = 1.0,
    block_frames: int = 256,
    interpret: bool = False,
    mode: str = "split",
):
    """Fully fused Monte-Carlo step with the edge-compact decoder; returns
    summed counters [frames, frame_errors, bit_errors, detected, undetected].
    Drop-in for ``mc_pallas.mc_fused`` (``h`` must be concrete)."""
    from .mc_pallas import msg_harvest_enabled

    msg_harvest_enabled()  # assert the import-time sampler choice holds
    scatter, gather, bias, slab_has_dummy = edge_layout_stacked(h)
    return _mc_fused_edge_jit(
        weights_vec, jnp.asarray(seed, jnp.int32).reshape((1,)),
        scatter, gather, bias,
        np.asarray(h, np.float32), np.asarray(g, np.float32),
        num_iterations, batch, sigma, mean, block_frames, interpret, mode,
        slab_has_dummy,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_iterations", "batch", "block_frames", "interpret",
        "mode", "slab_has_dummy",
    ),
)
def _mc_fused_edge_jit(weights_vec, seed_arr, scatter, gather, bias, h, g,
                       num_iterations, batch, sigma, mean, block_frames,
                       interpret, mode="split", slab_has_dummy=None):
    edges, n = scatter.shape
    m = h.shape[0]
    dc = edges // m
    if batch % block_frames:
        raise ValueError(f"batch {batch} not a multiple of {block_frames}")
    grid = (batch // block_frames,)
    weights_vec = jnp.concatenate([
        weights_vec.astype(jnp.float32),
        jnp.stack([jnp.asarray(sigma, jnp.float32),
                   jnp.asarray(mean, jnp.float32)]),
    ])
    kernel = functools.partial(_mc_kernel, dc, num_iterations,
                               mode, slab_has_dummy)
    per_block = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((edges, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, edges), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, edges), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(g.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_frames, edges), jnp.float32)],
        interpret=interpret,
    )(seed_arr, weights_vec, jnp.asarray(scatter), jnp.asarray(gather),
      jnp.asarray(bias), jnp.asarray(h), jnp.asarray(g))
    return jnp.sum(per_block[:, 0, :5], axis=0)


def fused_counters_edge(code, params, variant, num_iterations, snr_db, batch,
                        seed, block_frames: int = 256, mode: str = "split"):
    """Convenience wrapper matching ``mc_pallas.fused_counters``."""
    from ..channel import sigma_for_snr
    from .nms import _weights

    w_vc, w_chk, w_marg = _weights(params, variant)
    vec = jnp.stack([w_vc, w_chk, w_marg]).astype(jnp.float32)
    return mc_fused_edge(
        vec, seed, code.h, code.g, num_iterations, batch,
        float(sigma_for_snr(snr_db, code.rate)), 1.0, block_frames,
        mode=mode,
    )


def _gather_dot(ct, x, mode):
    """(block, rows)ᵀ @ (block, cols) -> (rows, cols) one-hot gather.

    ``ct`` is 0/1 (bf16-exact).  Payload handling matches the decode mode:
    "highest" is bit-exact (bf16x3 splits represent f32 exactly and every
    output is a single-term sum), "split" ~2^-17, "bf16" truncates like the
    iteration matmuls already do."""
    dims = (((0,), (0,)), ((), ()))
    if mode == "split":
        ctb = ct.astype(jnp.bfloat16)
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            ctb, hi, dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            ctb, lo, dims, preferred_element_type=jnp.float32
        )
    if mode == "bf16":
        return jax.lax.dot_general(
            ct.astype(jnp.bfloat16), x.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        ct, x, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _scatter_dot(ct, y, mode):
    """(block, rows) @ (rows, cols) -> (block, cols) one-hot scatter."""
    if mode == "split":
        ctb = ct.astype(jnp.bfloat16)
        hi = y.astype(jnp.bfloat16)
        lo = (y - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.dot(ctb, hi, preferred_element_type=jnp.float32) + jnp.dot(
            ctb, lo, preferred_element_type=jnp.float32
        )
    if mode == "bf16":
        return jnp.dot(
            ct.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(
        ct, y, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _mc_schedule_kernel(dc, schedule, final_iters, mode,
                        slab_has_dummy,
                        seed_ref, weights_ref, scat_ref, gath_ref, bias_ref,
                        h_ref, g_ref, out_ref, *cv_refs):
    """Fused MC kernel with MULTI-STAGE in-kernel convergence compaction.

    ``schedule`` is a tuple of ``(iters_i, rows_i)`` stages: run ``iters_i``
    NMS iterations on the current (sub-)block, check syndromes once, then
    compact the unconverged rows (typically ~1/3 after 4 iterations at the
    bench operating point, ~1/5 after 6) into a ``rows_i``-row sub-block via
    one-hot MXU gathers — carrying their cv messages, so the continued
    iterations compute exactly what the one-shot kernel would — and finish
    with ``final_iters`` iterations on the innermost sub-block.  Soft values
    are scattered back through the stage chain in reverse; rows that converge
    at a stage boundary keep that stage's zero-syndrome decision (the
    reference's ``qualified`` accounting, ``ms_test.py:36-54``; measured
    indistinguishable from the full-T decision, scripts/cascade_fer_check.py).

    Counter tile lane 5 counts frames that did not fit a stage's capacity
    (summed over stages; judged at the stage check).  ``cv_refs`` holds one
    message scratch per nesting level: (block, edges), (rows_1, edges), ...
    """
    sigma = weights_ref[3]
    mean = weights_ref[4]
    w_vc = weights_ref[0]
    w_chk = weights_ref[1]
    w_marg = weights_ref[2]
    h = h_ref[:]
    g = g_ref[:]
    k = g.shape[0]
    bt = cv_refs[0].shape[0]
    n = h.shape[1]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    # --- sample (as _mc_kernel) ---
    msg, z = _sample_msg_and_normals(bt, n, k)
    prods = jnp.dot(msg, g, preferred_element_type=jnp.float32)
    codeword = prods - 2.0 * jnp.floor(prods * 0.5)
    llr = (1.0 - 2.0 * codeword) * (mean + sigma * z)

    # The cv/llr gathers at each stage boundary stay at >= split exactness
    # even in bf16 mode: a single-pass bf16 gather of the resumed cv messages
    # injects 2^-9 rounding at the boundary, which measurably biases marginal
    # frames toward failure (same-seed frame_err +193/2.1M vs one-shot); at
    # 2^-17 the divergence is only the converged-frame early judgment.
    gmode = "highest" if mode == "highest" else "split"
    overflow = [jnp.float32(0.0)]

    def run(idx, llr_s):
        cv_ref_s = cv_refs[idx]
        if idx == len(schedule):
            colsum = _decode_edge(dc, final_iters, w_vc, w_chk, llr_s,
                                  scat_ref, gath_ref, bias_ref, cv_ref_s,
                                  mode, slab_has_dummy, init_cv=(idx == 0))
            return colsum + w_marg * llr_s
        iters_i, rows_next = schedule[idx]
        colsum = _decode_edge(dc, iters_i, w_vc, w_chk, llr_s, scat_ref,
                              gath_ref, bias_ref, cv_ref_s, mode,
                              slab_has_dummy, init_cv=(idx == 0))
        soft_i = colsum + w_marg * llr_s
        hard_i = (soft_i < 0.0).astype(jnp.float32)
        synd_i = jnp.dot(hard_i, h.T, preferred_element_type=jnp.float32)
        synd_i = synd_i - 2.0 * jnp.floor(synd_i * 0.5)
        rows = llr_s.shape[0]
        u = jnp.max(synd_i, axis=1, keepdims=True)  # (rows, 1) 1 = unconverged

        # compaction map: rank among unconverged rows (exclusive prefix sum
        # via a strict-lower-triangular MXU matmul; 0/1 operands are
        # bf16-exact and sums accumulate in f32, so ranks are exact)
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
            > jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        ).astype(jnp.float32)
        rank = jnp.dot(tri, u, preferred_element_type=jnp.float32)
        covered = u * (rank < rows_next).astype(jnp.float32)  # (rows, 1)
        # int iota + cast: Mosaic's tpu.iota only produces integer vectors
        lanes_r = jax.lax.broadcasted_iota(
            jnp.int32, (rows, rows_next), 1
        ).astype(jnp.float32)
        ct = (lanes_r == rank).astype(jnp.float32) * covered  # (rows, rows_next)

        cv_refs[idx + 1][:] = _gather_dot(ct, cv_ref_s[:], gmode)
        soft_next = run(idx + 1, _gather_dot(ct, llr_s, gmode))

        # scatter back; converged/overflowed rows keep this stage's decision
        overflow[0] = overflow[0] + (jnp.sum(u) - jnp.sum(covered))
        scat_soft = _scatter_dot(ct, soft_next, mode)
        return jnp.where(covered > 0.5, scat_soft, soft_i)

    soft = run(0, llr)

    # --- count (as _mc_kernel, + overflow lane) ---
    hard = (soft < 0.0).astype(jnp.float32)
    err = jnp.abs(hard - codeword)
    frame_err = jnp.max(err, axis=1, keepdims=True)
    bit_err = jnp.sum(err)
    synd = jnp.dot(hard, h.T, preferred_element_type=jnp.float32)
    synd = synd - 2.0 * jnp.floor(synd * 0.5)
    detected = jnp.max(synd, axis=1, keepdims=True)
    undetected = jnp.maximum(frame_err - detected, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    vals = (
        jnp.where(lane == 0, jnp.float32(bt), 0.0)
        + jnp.where(lane == 1, jnp.sum(frame_err), 0.0)
        + jnp.where(lane == 2, bit_err, 0.0)
        + jnp.where(lane == 3, jnp.sum(detected), 0.0)
        + jnp.where(lane == 4, jnp.sum(undetected), 0.0)
        + jnp.where(lane == 5, overflow[0], 0.0)
    )
    out_ref[:] = jnp.where(row == 0, vals, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "schedule", "final_iters", "batch", "block_frames",
        "interpret", "mode", "slab_has_dummy",
    ),
)
def _mc_schedule_jit(weights_vec, seed_arr, scatter, gather, bias, h, g,
                     schedule, final_iters, batch, sigma, mean, block_frames,
                     interpret, mode="bf16", slab_has_dummy=None):
    edges, n = scatter.shape
    m = h.shape[0]
    dc = edges // m
    if batch % block_frames:
        raise ValueError(f"batch {batch} not a multiple of {block_frames}")
    rows_prev = block_frames
    for iters_i, rows_i in schedule:
        if rows_i >= rows_prev or rows_i % 8:
            raise ValueError(f"schedule rows must decrease in multiples of 8, "
                             f"got {schedule}")
        rows_prev = rows_i
    grid = (batch // block_frames,)
    weights_vec = jnp.concatenate([
        weights_vec.astype(jnp.float32),
        jnp.stack([jnp.asarray(sigma, jnp.float32),
                   jnp.asarray(mean, jnp.float32)]),
    ])
    kernel = functools.partial(_mc_schedule_kernel, dc, schedule, final_iters,
                               mode, slab_has_dummy)
    per_block = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((edges, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, edges), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, edges), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(g.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_frames, edges), jnp.float32)] + [
            pltpu.VMEM((rows_i, edges), jnp.float32) for _, rows_i in schedule
        ],
        interpret=interpret,
    )(seed_arr, weights_vec, jnp.asarray(scatter), jnp.asarray(gather),
      jnp.asarray(bias), jnp.asarray(h), jnp.asarray(g))
    return jnp.sum(per_block[:, 0, :6], axis=0)


# Default schedule (fraction of block_frames): 4 iterations on the full
# block -> compact the unconverged rows (~1/3 at the 3.0 dB bench point, so
# capacity 0.40625 = 208/512 sits ~3.7 sigma above the mean; overflow is
# counted in lane 5 and the MC harness redoes an overflowed step one-shot).
# Deeper schedules were measured and rejected: with the lane-packed
# tournament an extra stage's boundary cost (syndrome check + rank matmul +
# split-exactness cv gather) exceeds the iterations it saves —
# ((4,.5),(2,.25)) 23.8 vs ((4,.5),) 24.0 M cw/s on v5e.
DEFAULT_COMPACT_SCHEDULE = ((4, 0.40625),)


def build_rows_schedule(schedule, block_frames: int, num_iterations: int):
    """((iters, frac), ...) -> ((iters, rows), ...) truncated to the stages
    that leave at least one iteration after them.  Row capacities are
    ``int(block_frames * frac)`` rounded DOWN to a multiple of 8 (the
    ``_mc_schedule_jit`` validity requirement), floored at 64 (one sublane
    tile of frames; below that the gather/scatter overhead always exceeds
    the savings) and capped at the previous stage's rows minus 8 — any
    (frac, block) pair therefore yields a valid schedule or drops the
    stage, instead of raising inside the harness's fallback chain."""
    rows_schedule = []
    spent = 0
    rows_prev = block_frames
    for iters_i, frac in schedule:
        if spent + iters_i >= num_iterations:
            break  # not enough iterations left to be worth a stage
        rows = max(64, int(block_frames * frac)) // 8 * 8
        rows = min(rows, rows_prev - 8)
        if rows < 64:
            break  # capacity floor can't fit under the previous stage
        rows_schedule.append((iters_i, rows))
        rows_prev = rows
        spent += iters_i
    return tuple(rows_schedule), num_iterations - spent


def fused_counters_edge_compact(code, params, variant, num_iterations, snr_db,
                                batch, seed, t1: int = 4,
                                block_frames: int = 512, mode: str = "bf16",
                                compact_frac: float = 0.5,
                                schedule=None,
                                interpret: bool = False):
    """Early-termination counters [frames, frame_err, bit_err, detected,
    undetected, overflow] via in-kernel convergence compaction.

    ``schedule`` is a tuple of ``(iters, frac)`` compaction stages (fractions
    of ``block_frames``); when None, a single ``(t1, compact_frac)`` stage is
    used (backward-compatible form).  Iterations after the last stage run on
    the innermost sub-block."""
    from ..channel import sigma_for_snr
    from .mc_pallas import msg_harvest_enabled
    from .nms import _weights

    msg_harvest_enabled()  # assert the import-time sampler choice holds
    w_vc, w_chk, w_marg = _weights(params, variant)
    vec = jnp.stack([w_vc, w_chk, w_marg]).astype(jnp.float32)
    scatter, gather, bias, slab_has_dummy = edge_layout_stacked(code.h)
    if schedule is None:
        schedule = ((t1, compact_frac),)
    rows_schedule, final_iters = build_rows_schedule(
        schedule, block_frames, num_iterations)
    return _mc_schedule_jit(
        vec, jnp.asarray(seed, jnp.int32).reshape((1,)),
        scatter, gather, bias,
        np.asarray(code.h, np.float32), np.asarray(code.g, np.float32),
        rows_schedule, final_iters, batch,
        float(sigma_for_snr(snr_db, code.rate)), 1.0, block_frames,
        interpret, mode, slab_has_dummy,
    )
