"""Two-phase early-termination Monte-Carlo cascade for the fused NMS kernel.

At the bench operating point (CCSDS (128,64), 3.0 dB) two thirds of all
frames reach a zero syndrome within 4 NMS iterations, and once the syndrome
is zero the final hard decision essentially never changes (measured 0/21k
converged frames diverging at T1=4; FER identical within Monte-Carlo noise —
see tests/test_mc_cascade.py and scripts/cascade_fer_check.py).  The fixed
12-iteration fused kernel therefore wastes ~2/3 of its decode FLOPs.

The cascade splits the budget:

* **Phase 1** runs T1 iterations for every frame, checks the syndrome once,
  banks the error counters of converged frames (their zero-syndrome decision
  — exactly the reference's ``qualified`` accounting, ``ms_test.py:36-54``),
  and emits a per-frame unconverged flag.
* A fixed-capacity ``jnp.nonzero`` compacts the unconverged frame ids.
* **Phase 2** re-decodes ONLY those frames from scratch with the full T
  iterations — their counters are exactly those of the one-shot kernel.

Restarting (rather than resuming) phase 2 keeps the kernels stateless; the
idealized cost is ``T1/T + unconverged_fraction`` of the one-shot kernel.

MEASURED OUTCOME (v5e, 2M frames): the idealized win does not materialize —
the cross-kernel compaction is the wall (XLA's ``jnp.nonzero``/sort/cumsum
all cost 28-115 ms on 2M elements, more than the saved iterations), and the
one-shot kernel's fixed cost (~25 ms of sampling/launch per full pass) is
paid twice.  11.8 M cw/s vs 17.9 one-shot.  The production early-termination
path is instead ``nms_edge_pallas.fused_counters_edge_compact``, which
compacts unconverged rows INSIDE the kernel with one-hot MXU gathers and
resumes their messages (no cross-kernel traffic at all).

This module is kept as the **per-frame-reproducible** Monte-Carlo variant:
its counter-based hash RNG regenerates any frame's exact channel
realization from ``(seed, frame_id)`` alone — replaying a single Monte-Carlo
failure for debugging costs one 1-frame kernel call, which the stateful
on-core PRNG cannot do.

To let phase 2 regenerate a frame's exact channel realization from its
global frame id alone, sampling uses a **counter-based hash RNG** (murmur3
fmix32 over (frame_id, stream) counters) instead of the stateful on-core
PRNG: every frame is reproducible from ``(seed, frame_id)`` in any kernel —
also handy for replaying single Monte-Carlo failures.  The generator is
validated against the stateful-PRNG kernel statistically
(scripts/cascade_fer_check.py) and via moment tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nms_edge_pallas import _decode_edge, edge_layout_stacked

_TWO_PI = 6.283185307179586
_GOLD1 = np.int32(-1640531527)  # 0x9E3779B9 (golden-ratio increment)
_GOLD2 = np.int32(-1274982907)  # 0xB4014305 (odd constant for streams)


def _lshr(x, r: int):
    """Logical shift right on int32 bit patterns."""
    return pltpu.bitcast(
        jnp.right_shift(pltpu.bitcast(x, jnp.uint32), jnp.uint32(r)), jnp.int32
    )


def _mix(x):
    """murmur3 fmix32: full-avalanche 32-bit mixer (int32 wrap arithmetic)."""
    x = x ^ _lshr(x, 16)
    x = x * jnp.int32(-2048144789)  # 0x85EBCA6B
    x = x ^ _lshr(x, 13)
    x = x * jnp.int32(-1028477387)  # 0xC2B2AE35
    x = x ^ _lshr(x, 16)
    return x


def _stream_bits(base, stream):
    """Random int32 word per (frame base, stream counter) pair."""
    return _mix(base ^ (stream * _GOLD2))


def _bits_to_uniform(w):
    """(0,1) uniform from the top 24 bits (as mc_pallas._uniform01)."""
    u24 = _lshr(w, 8)
    return u24.astype(jnp.float32) * (1.0 / 16777216.0) + (0.5 / 16777216.0)


def _sample(fid, seed, g_mat, sigma, mean, n, k):
    """Deterministic per-frame-id channel sample.

    fid: (bt, 1) int32 global frame ids.  Returns (codeword, llr), both
    (bt, n) f32, identical for the same (seed, fid) in any kernel."""
    bt = fid.shape[0]
    base = _mix(fid * _GOLD1 + seed)  # (bt, 1)
    sk = jax.lax.broadcasted_iota(jnp.int32, (bt, k), 1) + 1
    msg = (_stream_bits(base, sk) & jnp.int32(1)).astype(jnp.float32)
    prods = jnp.dot(msg, g_mat, preferred_element_type=jnp.float32)
    codeword = prods - 2.0 * jnp.floor(prods * 0.5)
    sn = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1)
    u1 = _bits_to_uniform(_stream_bits(base, sn + jnp.int32(k + 1)))
    u2 = _bits_to_uniform(_stream_bits(base, sn + jnp.int32(k + 1 + n)))
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
    received = mean + sigma * z
    llr = (1.0 - 2.0 * codeword) * received
    return codeword, llr


def _counter_tile(bt, frames, frame_err, bit_err, detected, undetected):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    vals = (
        jnp.where(lane == 0, frames, 0.0)
        + jnp.where(lane == 1, frame_err, 0.0)
        + jnp.where(lane == 2, bit_err, 0.0)
        + jnp.where(lane == 3, detected, 0.0)
        + jnp.where(lane == 4, undetected, 0.0)
    )
    return jnp.where(row == 0, vals, 0.0)


def _phase1_kernel(dc, t1, mode, slab_has_dummy,
                   seed_ref, scalars_ref, scat_ref, gath_ref, bias_ref,
                   h_ref, g_ref, out_ref, flag_ref, cv_ref):
    seed = seed_ref[0]  # SMEM int32: exact (an f32 lane rounds > 2^24)
    w_vc, w_chk, w_marg = scalars_ref[0], scalars_ref[1], scalars_ref[2]
    sigma, mean = scalars_ref[3], scalars_ref[4]  # SMEM: no per-SNR recompiles
    h = h_ref[:]
    g = g_ref[:]
    k, n = g.shape
    bt = cv_ref.shape[0]
    fid = (
        pl.program_id(0) * bt
        + jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
    )
    codeword, llr = _sample(fid, seed, g, sigma, mean, n, k)
    colsum = _decode_edge(dc, t1, w_vc, w_chk, llr, scat_ref, gath_ref,
                          bias_ref, cv_ref, mode, slab_has_dummy)
    soft = colsum + w_marg * llr
    hard = (soft < 0.0).astype(jnp.float32)
    synd = jnp.dot(hard, h.T, preferred_element_type=jnp.float32)
    synd = synd - 2.0 * jnp.floor(synd * 0.5)
    unconv = jnp.max(synd, axis=1, keepdims=True)  # (bt, 1) 0/1
    conv = 1.0 - unconv
    err = jnp.abs(hard - codeword)
    frame_err = jnp.max(err, axis=1, keepdims=True) * conv
    bit_err = jnp.sum(err * conv)
    # converged frames have a zero syndrome: any error is undetected
    out_ref[:] = _counter_tile(
        bt, jnp.sum(conv), jnp.sum(frame_err), bit_err, 0.0, jnp.sum(frame_err)
    )
    flag_ref[:] = unconv


def _phase2_kernel(dc, t, mode, slab_has_dummy,
                   seed_ref, scalars_ref, scat_ref, gath_ref, bias_ref,
                   h_ref, g_ref, ids_ref, out_ref, cv_ref):
    seed = seed_ref[0]  # SMEM int32: exact (an f32 lane rounds > 2^24)
    w_vc, w_chk, w_marg = scalars_ref[0], scalars_ref[1], scalars_ref[2]
    sigma, mean = scalars_ref[3], scalars_ref[4]  # SMEM: no per-SNR recompiles
    h = h_ref[:]
    g = g_ref[:]
    k, n = g.shape
    bt = cv_ref.shape[0]
    fid = ids_ref[:]  # (bt, 1) int32, -1 padding
    valid = (fid >= 0).astype(jnp.float32)  # (bt, 1)
    codeword, llr = _sample(jnp.maximum(fid, 0), seed, g, sigma, mean, n, k)
    colsum = _decode_edge(dc, t, w_vc, w_chk, llr, scat_ref, gath_ref,
                          bias_ref, cv_ref, mode, slab_has_dummy)
    soft = colsum + w_marg * llr
    hard = (soft < 0.0).astype(jnp.float32)
    err = jnp.abs(hard - codeword) * valid
    frame_err = jnp.max(err, axis=1, keepdims=True)
    synd = jnp.dot(hard, h.T, preferred_element_type=jnp.float32)
    synd = synd - 2.0 * jnp.floor(synd * 0.5)
    detected = jnp.max(synd, axis=1, keepdims=True) * valid
    undetected = jnp.maximum(frame_err - detected, 0.0)
    out_ref[:] = _counter_tile(
        bt, jnp.sum(valid), jnp.sum(frame_err), jnp.sum(err),
        jnp.sum(detected), jnp.sum(undetected),
    )


def _common_specs(edges, n, m, g_shape, block):
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (int32)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # weights + sigma/mean
        pl.BlockSpec((edges, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, edges), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, edges), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(g_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


@functools.partial(
    jax.jit,
    static_argnames=("t1", "batch", "block_frames",
                     "interpret", "mode", "slab_has_dummy"),
)
def _phase1_jit(seed_arr, params_vec, scatter, gather, bias, h, g, t1, batch, sigma,
                mean, block_frames, interpret, mode, slab_has_dummy):
    edges, n = scatter.shape
    m = h.shape[0]
    dc = edges // m
    grid = (batch // block_frames,)
    params_vec = jnp.concatenate([
        params_vec.astype(jnp.float32),
        jnp.stack([jnp.asarray(sigma, jnp.float32),
                   jnp.asarray(mean, jnp.float32)]),
    ])
    kernel = functools.partial(_phase1_kernel, dc, t1, mode,
                               slab_has_dummy)
    counters, flags = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_common_specs(edges, n, m, g.shape, block_frames),
        out_specs=(
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_frames, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((block_frames, edges), jnp.float32)],
        interpret=interpret,
    )(seed_arr, params_vec, jnp.asarray(scatter), jnp.asarray(gather),
      jnp.asarray(bias), jnp.asarray(h), jnp.asarray(g))
    return jnp.sum(counters[:, 0, :5], axis=0), flags


@functools.partial(
    jax.jit,
    static_argnames=("t", "cap", "block_frames",
                     "interpret", "mode", "slab_has_dummy"),
)
def _phase2_jit(seed_arr, params_vec, scatter, gather, bias, h, g, ids, t, cap, sigma,
                mean, block_frames, interpret, mode, slab_has_dummy):
    edges, n = scatter.shape
    m = h.shape[0]
    dc = edges // m
    grid = (cap // block_frames,)
    params_vec = jnp.concatenate([
        params_vec.astype(jnp.float32),
        jnp.stack([jnp.asarray(sigma, jnp.float32),
                   jnp.asarray(mean, jnp.float32)]),
    ])
    kernel = functools.partial(_phase2_kernel, dc, t, mode,
                               slab_has_dummy)
    specs = _common_specs(edges, n, m, g.shape, block_frames)
    specs.append(
        pl.BlockSpec((block_frames, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    )
    counters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_frames, edges), jnp.float32)],
        interpret=interpret,
    )(seed_arr, params_vec, jnp.asarray(scatter), jnp.asarray(gather),
      jnp.asarray(bias), jnp.asarray(h), jnp.asarray(g), ids)
    return jnp.sum(counters[:, 0, :5], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("t1", "t", "batch", "cap",
                     "block_frames", "interpret", "mode", "slab_has_dummy"),
)
def _cascade_jit(seed_arr, params_vec, scatter, gather, bias, h, g, t1, t, batch, cap,
                 sigma, mean, block_frames, interpret, mode, slab_has_dummy):
    c1, flags = _phase1_jit(
        seed_arr, params_vec, scatter, gather, bias, h, g, t1, batch, sigma, mean,
        block_frames, interpret, mode, slab_has_dummy,
    )
    (ids,) = jnp.nonzero(flags[:, 0] > 0.5, size=cap, fill_value=-1)
    c2 = _phase2_jit(
        seed_arr, params_vec, scatter, gather, bias, h, g,
        ids.astype(jnp.int32)[:, None], t, cap, sigma, mean, block_frames,
        interpret, mode, slab_has_dummy,
    )
    unconv_total = jnp.float32(batch) - c1[0]
    overflow = unconv_total - c2[0]  # frames that did not fit in `cap`
    return c1 + c2, overflow


_CAP_CACHE: dict = {}


def cascade_counters(code, params, variant, num_iterations, snr_db, batch,
                     seed, t1: int = 4, block_frames: int = 512,
                     mode: str = "bf16", interpret: bool = False):
    """Early-termination counters [frames, frame_err, bit_err, detected,
    undetected]; drop-in for ``nms_edge_pallas.fused_counters_edge`` (the
    counted ``frames`` always equals ``batch`` — capacity overflows retry
    with a larger phase-2 capacity)."""
    from ..channel import sigma_for_snr
    from .nms import _weights

    w_vc, w_chk, w_marg = _weights(params, variant)
    vec = jnp.stack([w_vc, w_chk, w_marg]).astype(jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))
    scatter, gather, bias, slab_has_dummy = edge_layout_stacked(code.h)
    h32 = np.asarray(code.h, np.float32)
    g32 = np.asarray(code.g, np.float32)
    sigma = float(sigma_for_snr(snr_db, code.rate))
    args = (seed_arr, vec, scatter, gather, bias, h32, g32)
    kw = dict(sigma=sigma, mean=1.0, block_frames=block_frames,
              interpret=interpret, mode=mode, slab_has_dummy=slab_has_dummy)

    key = (code.name, variant, t1, round(float(snr_db), 3),
           tuple(np.round(np.asarray(vec), 5).tolist()))
    frac = _CAP_CACHE.get(key)
    if frac is None:
        calib = min(batch, 131072)
        c1, _ = _phase1_jit(*args, t1=t1, batch=calib, **kw)
        frac = 1.0 - float(np.asarray(c1)[0]) / calib
        _CAP_CACHE[key] = frac
    margin = 6.0 * np.sqrt(max(frac * (1 - frac) * batch, 1.0)) + 2 * block_frames
    cap = int(frac * batch + margin)
    while True:
        cap = min(batch, ((cap + block_frames - 1) // block_frames) * block_frames)
        counters, overflow = _cascade_jit(*args, t1=t1, t=num_iterations,
                                          batch=batch, cap=cap, **kw)
        if float(np.asarray(overflow)) <= 0 or cap >= batch:
            return counters
        cap = cap * 2  # extremely rare: re-run with doubled capacity
