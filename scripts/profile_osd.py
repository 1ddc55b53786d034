#!/usr/bin/env python
"""Profile the OSD-stage components on the real chip.

Times (with host-transfer sync, axon's block_until_ready is unreliable):
DIA refine, prepare (sort + GE + gathers), block_discrepancy_minima,
sliding_walk — plus the fused end-to-end sliding_osd rate.
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
from short_ldpc_decoding_osd_tpu.models import make_dia
from short_ldpc_decoding_osd_tpu.osd import engine, segments

B = int(os.environ.get("PROF_BATCH", 4096))
T = 12
REPS = int(os.environ.get("PROF_REPS", 5))


def sync(x):
    # reduce on device, transfer one scalar: the axon tunnel is slow (~8MB
    # array transfers dominate timings otherwise)
    leaf = jax.tree_util.tree_leaves(x)[0]
    import jax.numpy as jnp
    return np.asarray(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, **kw):
    """Amortized timing: K async dispatches + one sync.  A single
    dispatch+sync round-trip over the axon tunnel costs ~24 ms regardless of
    the computation, so per-call times are measured by queueing K independent
    executions and syncing once (dispatch is async; the device runs them
    back-to-back)."""
    out = fn(*args, **kw)
    sync(out)
    k = int(os.environ.get("PROF_CHAIN", 20))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args, **kw)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / k)
    print(f"{name:32s} {best*1e3:9.2f} ms   {B/best:12.0f} frames/s")
    return out


def main():
    code = get_code("ccsds_128_64")
    rng = np.random.default_rng(0)
    traj = jnp.asarray(rng.normal(0.5, 1.5, (B, T + 1, code.n)), jnp.float32)
    labs = jnp.asarray(rng.integers(0, 2, (B, code.n)), jnp.int32)
    h = jnp.asarray(code.h)

    model = make_dia("model_cnn", code.n, T + 1)
    import pickle
    with open("runs/r1_final/dia_model_cnn.pkl", "rb") as f:
        dia_params = pickle.load(f)
    import json
    with open("runs/r1_final/decoding_path.json") as f:
        decoding_path = json.load(f)["path"]
    with open("runs/r1_final/stopper_params.pkl", "rb") as f:
        s_params = pickle.load(f)
    from short_ldpc_decoding_osd_tpu.pipeline.recipe import stopper_engine_params
    fcn = stopper_engine_params(s_params)

    blocks, acc = segments.build_tep_blocks(decoding_path, code.k, 6)
    teps, mask = segments.stack_padded_blocks(blocks)
    teps_j, mask_j = jnp.asarray(teps), jnp.asarray(mask)
    print(f"batch {B}, teps {teps_j.shape}, device {jax.devices()[0]}")

    refined = timeit("dia_refine", jax.jit(model.refine), dia_params, traj)
    prep = timeit("prepare (sort+GE+gathers)",
                  jax.jit(engine.prepare, static_argnames=("k",)),
                  refined, traj[:, 0], labs, h, k=code.k)
    minima = timeit("block_discrepancy_minima",
                    engine.block_discrepancy_minima, prep, teps_j, mask_j, code.k)
    teps_c, mask_c, bounds = segments.pack_tep_chunks(blocks)
    tc_j, mc_j = jnp.asarray(teps_c), jnp.asarray(mask_c)
    timeit("block_minima (chunked)",
           lambda p, t, m: engine.block_discrepancy_minima(
               p, t, m, code.k, bounds=bounds),
           prep, tc_j, mc_j)
    timeit("sliding_walk", engine.sliding_walk, minima[0], fcn)

    def full(traj, labs):
        r = model.refine(dia_params, traj)
        p = engine.prepare(r, traj[:, 0], labs, h, code.k)
        return engine.sliding_osd(p, teps_j, mask_j, acc, fcn, code.k)

    timeit("end-to-end sliding_osd", full, traj, labs)

    # fused single-jit step with the composed linear DIA filter
    r_slow = np.asarray(model.refine(dia_params, traj[:64]))
    r_fast = np.asarray(jax.jit(model.refine_fast)(dia_params, traj[:64]))
    err = np.abs(r_slow - r_fast).max() / max(np.abs(r_slow).max(), 1e-9)
    print(f"refine_fast max rel err vs refine: {err:.2e}")
    step = engine.make_dl_osd_step(model, h, code.k)
    acc_j = jnp.asarray(acc, jnp.int32)
    timeit("fused dl_osd_step", step, dia_params, traj, labs, teps_j,
           mask_j, acc_j, fcn)
    step_c = engine.make_dl_osd_step(model, h, code.k, bounds=bounds)
    timeit("fused dl_osd_step (chunked)", step_c, dia_params, traj, labs,
           tc_j, mc_j, acc_j, fcn)

    # finer: GE alone vs the gathers in prepare
    from short_ldpc_decoding_osd_tpu.ops import gf2ops
    perm, h_p = jax.jit(gf2ops.reliability_sort)(refined, h)
    sync(h_p)
    timeit("reliability_sort", jax.jit(gf2ops.reliability_sort), refined, h)
    timeit("identify_mrb (dense in)", jax.jit(gf2ops.identify_mrb,
                                              static_argnames=("k",)),
           h_p, k=code.k)
    timeit("identify_mrb_from_perm", jax.jit(gf2ops.identify_mrb_from_perm,
                                             static_argnames=("k",)),
           perm, h, k=code.k)


if __name__ == "__main__":
    main()
