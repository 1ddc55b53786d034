#!/usr/bin/env python
"""Timing probe for pack_columns/unpack_columns variants (gf2_bitpack glue).

The ge_probe found pack (3.2 ms) and unpack (3.5 ms) each cost as much as
the entire 64-step elimination loop at B=4096 — the packed-GE wrapper is
data-movement-bound, not elimination-bound.  Variants:

  pack/current     shift + sum-over-32 then transpose (production)
  pack/dot         f32 MXU dot against a (32, 2) lo/hi power matrix
                   (sums of distinct powers < 2^16 are f32-exact)
  pack/transposed  transpose (B,m,nw-dense) first, shift-sum after
  unpack/current   word gather (m,n,B) + bit test + transpose (production)
  unpack/transmul  transpose the 16 MB packed tensor first, then bit-expand
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp

from short_ldpc_decoding_osd_tpu.codes import get_code
from short_ldpc_decoding_osd_tpu.ops import gf2_bitpack

B = int(os.environ.get("GE_BATCH", 4096))
REPS = 5
CHAIN = 20


@jax.jit
def pack_dot(h_batch):
    b, m, n = h_batch.shape
    nw = -(-n // 32)
    x = h_batch.astype(jnp.float32)
    if nw * 32 != n:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, nw * 32 - n)))
    x = x.reshape(b, m, nw, 32)
    pw = np.zeros((32, 2), np.float32)
    pw[:16, 0] = [float(1 << i) for i in range(16)]
    pw[16:, 1] = [float(1 << (i - 16)) for i in range(16, 32)]
    parts = jnp.einsum("bmwi,ip->bmwp", x, jnp.asarray(pw),
                       preferred_element_type=jnp.float32)
    lo = parts[..., 0].astype(jnp.int32)
    hi = parts[..., 1].astype(jnp.int32)
    words = lo | jnp.left_shift(hi, 16)
    return jnp.transpose(words, (1, 2, 0))


@jax.jit
def pack_transposed(h_batch):
    b, m, n = h_batch.shape
    nw = -(-n // 32)
    x = h_batch
    if nw * 32 != n:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, nw * 32 - n)))
    x = jnp.transpose(x, (1, 2, 0)).reshape(m, nw, 32, b).astype(jnp.int32)
    bits = jnp.arange(32, dtype=jnp.int32)
    return jnp.sum(jnp.left_shift(x, bits[None, None, :, None]), axis=2)


@jax.jit
def unpack_transmul(packed):
    m, nw, b = packed.shape
    x = jnp.transpose(packed, (2, 0, 1))  # (B, m, nw): 16 MB move
    bit_of = jnp.left_shift(
        jnp.int32(1), jnp.arange(32, dtype=jnp.int32))
    bits = (x[..., None] & bit_of) != 0  # (B, m, nw, 32)
    return bits.reshape(b, m, nw * 32).astype(jnp.int8)


def timeit(name, fn, arg):
    out = fn(arg)
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = [fn(arg) for _ in range(CHAIN)]
        np.asarray(sum(jnp.sum(jax.tree_util.tree_leaves(o)[0]
                               .astype(jnp.float32)) for o in outs))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    print(f"{name:18s} {best*1e3:7.2f} ms  ({B/best:,.0f} frames/s)")
    return out


def main():
    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(0)
    h = np.broadcast_to(code.h, (B, *code.h.shape))
    perm = np.argsort(rng.random((B, code.n)), axis=1)
    hb = jax.device_put(jnp.asarray(
        np.take_along_axis(h, perm[:, None, :], axis=2).astype(np.int8)))
    np.asarray(jnp.sum(hb.astype(jnp.float32)))

    pc = jax.jit(gf2_bitpack.pack_columns)
    ref = timeit("pack/current", pc, hb)
    o1 = timeit("pack/dot", pack_dot, hb)
    o2 = timeit("pack/transposed", pack_transposed, hb)
    assert np.array_equal(np.asarray(ref), np.asarray(o1)), "pack/dot wrong"
    assert np.array_equal(np.asarray(ref), np.asarray(o2)), "pack/trans wrong"

    up = jax.jit(lambda p: gf2_bitpack.unpack_columns(p, code.n))
    r0 = timeit("unpack/current", up, ref)
    r1 = timeit("unpack/transmul", unpack_transmul, ref)
    assert np.array_equal(np.asarray(r0), np.asarray(r1)), "unpack wrong"


if __name__ == "__main__":
    main()
