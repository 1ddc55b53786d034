"""Fully fused Monte-Carlo NMS kernel: sample -> encode -> decode -> count.

The end-game of the TPU-first design: one Pallas kernel per frame block that

1. draws random message bits and AWGN noise with the on-core PRNG
   (Box-Muller from ``pltpu.prng_random_bits`` — no host or HBM-staged
   randomness at all),
2. encodes on the MXU (``msg @ G mod 2``),
3. runs all T NMS iterations in VMEM (same body as ``nms_pallas``),
4. computes syndrome/error counters on the MXU,

and writes only a handful of per-block counters to HBM.  The Monte-Carlo
loop's HBM traffic is ~zero; the chip is pure VPU/MXU compute.  Used for the
error-budget FER sweeps where failures need not be captured (the capture path
re-derives failures separately).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38
_TWO_PI = 6.283185307179586


def _random_words(shape):
    """Raw PRNG words as int32 (Mosaic lacks uint32 vector arithmetic)."""
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)


def _u24_from_words(w):
    """Words -> (0,1) uniforms using the top 24 bits (f32-mantissa exact)."""
    u24 = jnp.right_shift(pltpu.bitcast(w, jnp.uint32), jnp.uint32(8))
    # Mosaic lacks uint32->f32; the 24-bit value is int32-safe
    u24 = pltpu.bitcast(u24, jnp.int32)
    return u24.astype(jnp.float32) * (1.0 / 16777216.0) + (0.5 / 16777216.0)


def _uniform01(shape):
    """(0,1) uniforms from raw PRNG bits (24-bit mantissa path)."""
    return _u24_from_words(_random_words(shape))


def _standard_normals(bt: int, n: int):
    """(bt, n) standard normals via full Box-Muller pairs.

    Each (u1, u2) uniform pair yields BOTH ``r cos`` and ``r sin`` normals, so
    an even-n draw needs half the uniforms and half the log/sqrt/trig
    transcendentals of the naive one-normal-per-pair form (the sampling
    transcendentals are a measurable share of the fused MC kernels' fixed
    cost)."""
    if n % 2:
        u1 = _uniform01((bt, n))
        u2 = _uniform01((bt, n))
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
    half = n // 2
    u1 = _uniform01((bt, half))
    u2 = _uniform01((bt, half))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)


# SLDPC_MSG_HARVEST is read ONCE at import: the choice is baked into every
# compiled kernel but is not part of any jit cache key, so flipping the env
# var mid-process would silently keep kernels compiled for the other sampler.
# ``msg_harvest_enabled`` asserts against exactly that (r3 ADVICE).
_MSG_HARVEST = os.environ.get("SLDPC_MSG_HARVEST", "1") != "0"


def msg_harvest_enabled() -> bool:
    cur = os.environ.get("SLDPC_MSG_HARVEST", "1") != "0"
    if cur != _MSG_HARVEST:
        raise RuntimeError(
            f"SLDPC_MSG_HARVEST changed after import "
            f"({_MSG_HARVEST} -> {cur}); the sampler choice is baked into "
            "compiled kernels at import time — set the env var before "
            "starting the process"
        )
    return _MSG_HARVEST


def _sample_msg_and_normals(bt: int, n: int, k: int):
    """Draw ``(bt, k)`` message bits and ``(bt, n)`` standard normals.

    The normals consume bits 8..31 of each PRNG word (the 24-bit uniform
    path above); bits 0..7 are spare.  The message bits HARVEST bit 0 of the
    first ``k`` noise words instead of paying a separate ``(bt, k)`` PRNG
    draw — distinct bit positions of one word are independent for the
    counter-based on-core generator, and the FER agreement with the
    separate-draw sampler is validated statistically over 8.4M frames/arm
    (scripts/fer_mode_check.py --compare-env, z = +1.62; see ROUND3.md).
    ``SLDPC_MSG_HARVEST=0`` (set BEFORE process start) restores the
    separate draw; FER curves where the per-word bit-independence
    assumption must not be load-bearing should use it."""
    harvest = msg_harvest_enabled()
    if not harvest:
        # msg drawn FIRST: reproduces the pre-harvest kernels' same-seed
        # streams exactly
        msg_words = _random_words((bt, k))
        z = _standard_normals(bt, n)
    elif n % 2:
        w1 = _random_words((bt, n))
        w2 = _random_words((bt, n))
        z = jnp.sqrt(-2.0 * jnp.log(_u24_from_words(w1))) * jnp.cos(
            _TWO_PI * _u24_from_words(w2)
        )
        msg_words = w1[:, :k]
    else:
        half = n // 2
        w1 = _random_words((bt, half))
        w2 = _random_words((bt, half))
        r = jnp.sqrt(-2.0 * jnp.log(_u24_from_words(w1)))
        theta = _TWO_PI * _u24_from_words(w2)
        z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)
        if k <= half:
            msg_words = w1[:, :k]
        else:
            msg_words = jnp.concatenate([w1, w2[:, : k - half]], axis=1)
    msg = jnp.bitwise_and(msg_words, jnp.int32(1)).astype(jnp.float32)
    return msg, z


def _mc_kernel(
    num_iterations: int,
    seed_ref,  # SMEM int32 (1,): exact seed (an f32 lane would round > 2^24,
    # which the sharded per-device seed striding reaches quickly)
    weights_ref,  # SMEM f32: [w_vc, w_chk, w_marg, sigma, mean] — sigma/mean
    # ride SMEM instead of being baked in as constants so one compile serves
    # every SNR point of a sweep (bitwise-identical arithmetic)
    h_ref,  # (m, n)
    g_ref,  # (k, n)
    out_ref,  # (1, 8, 128) counter tile; row 0 lanes 0..4 hold
    # [frames, frame_err, bit_err, detected, undetected]
    cv_ref,  # scratch (bt, m, n)
):
    sigma = weights_ref[3]
    mean = weights_ref[4]
    w_vc = weights_ref[0]
    w_chk = weights_ref[1]
    w_marg = weights_ref[2]
    h = h_ref[:]
    g = g_ref[:]
    m, n = h.shape
    k = g.shape[0]
    bt = cv_ref.shape[0]
    # seed and block id as SEPARATE seed words: `seed + program_id` would make
    # runs at consecutive seeds share almost all of their per-block streams
    # (block j of seed s == block j-1 of seed s+1), correlating "independent"
    # Monte-Carlo runs
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    # --- sample ---
    msg, z = _sample_msg_and_normals(bt, n, k)
    prods = jnp.dot(msg, g, preferred_element_type=jnp.float32)
    codeword = prods - 2.0 * jnp.floor(prods * 0.5)  # (bt, n) in {0,1}
    received = mean + sigma * z
    llr = (1.0 - 2.0 * codeword) * received

    # --- decode (same body as nms_pallas) ---
    edge = h > 0.0
    weighted_in = (w_vc * llr)[:, None, :]
    cv_ref[:] = jnp.zeros_like(cv_ref)

    def body(_, carry):
        cv = cv_ref[:]
        total = jnp.sum(cv, axis=1)[:, None, :] + weighted_in
        vc = total * h - cv
        neg = jnp.logical_and(vc < 0.0, edge)
        negcount = jnp.sum(neg.astype(jnp.float32), axis=-1, keepdims=True)
        parity = negcount - 2.0 * jnp.floor(negcount * 0.5)
        anyzero = jnp.any(jnp.logical_and(vc == 0.0, edge), axis=-1, keepdims=True)
        row_sign = jnp.where(anyzero, 0.0, 1.0 - 2.0 * parity)
        own = jnp.where(vc > 0.0, 1.0, jnp.where(vc < 0.0, -1.0, 0.0))
        edge_sign = row_sign * own * h
        mag = jnp.minimum(jnp.abs(vc), _BIG)
        masked = jnp.where(edge, mag, _BIG)
        min1 = jnp.min(masked, axis=-1, keepdims=True)
        is_min = jnp.logical_and(masked <= min1, edge)
        dup = jnp.sum(is_min.astype(jnp.float32), axis=-1, keepdims=True) > 1.5
        strict2 = jnp.min(
            jnp.where(masked > min1, masked, _BIG), axis=-1, keepdims=True
        )
        min2 = jnp.where(dup, min1, strict2)
        emag = jnp.where(mag > min1, min1, min2) * h
        cv_ref[:] = w_chk * emag * edge_sign
        return carry

    jax.lax.fori_loop(0, num_iterations, body, 0, unroll=False)
    soft = jnp.sum(cv_ref[:], axis=1) + w_marg * llr

    # --- count ---
    hard = (soft < 0.0).astype(jnp.float32)
    err = jnp.abs(hard - codeword)
    frame_err = jnp.max(err, axis=1, keepdims=True)  # (bt, 1)
    bit_err = jnp.sum(err)
    synd = jnp.dot(hard, h.T, preferred_element_type=jnp.float32)
    synd = synd - 2.0 * jnp.floor(synd * 0.5)
    detected = jnp.max(synd, axis=1, keepdims=True)  # 1 if any parity violated
    undetected = jnp.maximum(frame_err - detected, 0.0)
    # place the 5 scalars in row 0, lanes 0..4 via lane masks (no scatter)
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


@functools.partial(
    jax.jit,
    static_argnames=("num_iterations", "batch", "block_frames", "interpret"),
)
def mc_fused(
    weights_vec: jnp.ndarray,  # [w_vc, w_chk, w_marg] float32
    seed,  # int32 scalar/array (may be traced, e.g. a shard_map shard)
    h: jnp.ndarray,
    g: jnp.ndarray,
    num_iterations: int,
    batch: int,
    sigma,  # traced: NOT a compile-time constant (one compile per sweep)
    mean=1.0,
    block_frames: int = 32,
    interpret: bool = False,
):
    """Run `batch` frames fully in-kernel; returns summed counter vector
    [frames, frame_errors, bit_errors, detected, undetected]."""
    msg_harvest_enabled()  # assert the import-time sampler choice holds
    m, n = h.shape
    grid = (batch // block_frames,)
    kernel = functools.partial(_mc_kernel, num_iterations)
    weights_vec = jnp.concatenate([
        weights_vec.astype(jnp.float32),
        jnp.stack([jnp.asarray(sigma, jnp.float32),
                   jnp.asarray(mean, jnp.float32)]),
    ])
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))
    per_block = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((m, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(g.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_frames, m, n), jnp.float32)],
        interpret=interpret,
    )(seed_arr, weights_vec, h.astype(jnp.float32), g.astype(jnp.float32))
    return jnp.sum(per_block[:, 0, :5], axis=0)


def fused_counters(code, params, variant, num_iterations, snr_db, batch, seed,
                   block_frames=32):
    """Convenience wrapper matching the harness counter convention."""
    from ..channel import sigma_for_snr
    from .nms import _weights

    w_vc, w_chk, w_marg = _weights(params, variant)
    vec = jnp.stack([w_vc, w_chk, w_marg]).astype(jnp.float32)
    return mc_fused(
        vec,
        seed,
        jnp.asarray(code.h, jnp.float32),
        jnp.asarray(code.g, jnp.float32),
        num_iterations,
        batch,
        float(sigma_for_snr(snr_db, code.rate)),
        1.0,
        block_frames,
    )
