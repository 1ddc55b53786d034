"""Sharded Monte-Carlo + training steps over a device mesh.

Design (SURVEY.md §7 decision 6): each device draws its own frames from a
folded PRNG stream, decodes them fully on device, and contributes scalar
counters; XLA turns the batch-sharded reductions into ``psum`` over ICI.
Parameters are replicated, the codeword batch is sharded on the 'mc' axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..channel import ChannelSpec, sample_batch
from ..codes import Code
from ..ops import nms
from ..train.optim import staircase_adam
from ..utils.dtypes import count_dtype


def _sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def sharded_nms_mc_step(
    code: Code,
    variant: str,
    num_iterations: int,
    spec: ChannelSpec,
    per_device_batch: int,
    mesh: Mesh,
):
    """Jitted (params, key) -> counters with frames sharded over the mesh.

    The key is split per device inside the sharded computation via
    ``fold_in`` on the device's batch slice index, so every device gets an
    independent stream."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    total_batch = per_device_batch * n_dev
    decode_h = code.extended().h if variant == "ENMS" else code.h
    h = jnp.asarray(decode_h, jnp.float32)
    gen = jnp.asarray(code.g, jnp.float32)
    edge_cols = (
        jnp.asarray(nms.edge_columns(decode_h)) if variant == "NMS-r" else None
    )

    # codes above the VMEM kernels' envelope ride the edge-layout XLA rung
    # (ops/nms_edge_xla) instead of the dense decoder, as on a single chip.
    # The condition depends only on the code shape + backend, so every host
    # of a multi-process mesh picks the same program (the host-uniformity
    # property the rung-pinning tests guard).
    from ..ops.nms_edge_xla import auto_select as _edge_xla_auto

    _h_np = np.asarray(decode_h)
    use_edge_xla = _edge_xla_auto(_h_np, variant)

    batch_sharding = _sharding(mesh, axis)
    replicated = _sharding(mesh)

    @functools.partial(
        jax.jit,
        out_shardings=replicated,
    )
    def step(params, key):
        # one global sample; XLA partitions the batch dim over the mesh
        llr, words = sample_batch(key, spec, gen, total_batch)
        llr = jax.lax.with_sharding_constraint(llr, batch_sharding)
        words = jax.lax.with_sharding_constraint(words, batch_sharding)
        if use_edge_xla:
            from ..ops.nms_edge_xla import decode_final_edge_xla

            soft_last = decode_final_edge_xla(
                params, _h_np, llr, num_iterations, variant, mode="high"
            )
        else:
            soft_last = nms.decode(
                params, h, llr, num_iterations, variant, edge_cols
            )[-1]
        st = nms.frame_stats(soft_last, words, h)
        cdt = count_dtype()  # int64 iff x64 enabled — see utils/dtypes.py
        return jnp.stack(
            [
                jnp.asarray(total_batch, cdt),
                jnp.sum(st["frame_error"].astype(cdt)),
                jnp.sum(st["bit_errors"].astype(cdt)),
                jnp.sum(st["detected_failure"].astype(cdt)),
                jnp.sum(st["undetected_error"].astype(cdt)),
            ]
        )

    return step


def device_seeds(base_seed: int, idx: int, n_dev: int) -> np.ndarray:
    """Per-device int32 kernel seeds for MC step ``idx``.

    Strided by ``n_dev`` so (step, device) -> seed is a bijection: a plain
    ``base + device`` offset would collide step i's device d+1 with step
    i+1's device d (identical (seed, program_id) pairs -> identical frames).
    With one device this reduces to the single-device harness seed
    ``base_seed * 100003 + idx`` exactly."""
    base = np.int64(base_seed) * 100003 + idx
    return ((base * n_dev + np.arange(n_dev, dtype=np.int64)) & 0x7FFFFFFF
            ).astype(np.int32)


def sharded_seed_counters(mesh: Mesh, counters_fn):
    """shard_map-wrap a per-device ``fn(params, seed_scalar) -> (L,)`` into a
    jitted ``(params, seeds (n_dev,)) -> (L,)`` with the counters psum'd over
    the mesh axis.  Params are replicated; each device consumes its own seed
    shard — this is the bridge that puts the fused in-kernel-PRNG Monte-Carlo
    kernels (which take a seed, not a jax.random key) on the mesh."""
    axis = mesh.axis_names[0]

    def per_device(params, seeds):
        c = counters_fn(params, seeds[0])
        return jax.lax.psum(c, axis)

    return jax.jit(
        jax.shard_map(
            per_device, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(),
            # pallas_call out_shapes carry no vma annotation, which the
            # varying-mesh-axes checker rejects; replication of the psum'd
            # counters is guaranteed by construction
            check_vma=False,
        )
    )


def sharded_fused_mc_step(
    code: Code,
    variant: str,
    num_iterations: int,
    snr_db: float,
    per_device_batch: int,
    mesh: Mesh,
    base_seed: int,
    spec: ChannelSpec | None = None,
):
    """Mesh-parallel Monte-Carlo step using the FUSED edge kernels per device.

    Returns ``step(params, key, idx) -> (counters (5,), None)`` matching the
    harness protocol.  Each device runs the same fused kernel ladder the
    single-device harness uses (compact -> one-shot -> halved blocks -> the
    sharded XLA step), with per-device seeds from ``device_seeds`` and the
    6 scalar counters psum'd over ICI — the Monte-Carlo sweep is
    embarrassingly parallel, so per-chip throughput on a mesh matches the
    single-chip fused kernels instead of silently dropping to the dense XLA
    decoder (round-2 VERDICT item 2).  Demotion decisions are host-side and
    permanent for the step's lifetime, exactly as in the single-device path;
    on non-TPU backends the fused rungs fail to lower and the ladder lands on
    the XLA rung, which is also how the CPU-mesh dryrun exercises this path.
    """
    import os

    from ..mc.harness import _attempt_fused
    from ..mc.ladder import (
        apply_pinned_rung,
        attempt_multiproc,
        build_ladder_step,
        ladder_blocks,
    )
    from ..ops.nms_edge_pallas import (
        DEFAULT_COMPACT_SCHEDULE,
        fused_counters_edge,
        fused_counters_edge_compact,
    )

    spec = spec or ChannelSpec.awgn(snr_db, code.rate)
    n_dev = mesh.devices.size
    batch = per_device_batch
    t1 = 4
    eblock, cblock, compact_enabled = ladder_blocks(
        code, batch, num_iterations, t1
    )
    # Error-driven demotion is HOST-LOCAL state: on a multi-process pod, one
    # host demoting while another stays on the fused rung issues DIFFERENT
    # collective programs in the same step — a deadlock in JAX's
    # multi-controller model.  (Overflow-driven compact->one-shot demotion is
    # safe: it reads a psum'd, replicated counter, so every host agrees.)
    # With >1 process, kernel errors therefore RAISE — except a single
    # transient retry of the identical compiled program, which is uniform
    # across hosts (ladder.attempt_multiproc); pre-pin a rung uniformly via
    # SLDPC_MESH_RUNG=compact|oneshot|xla.
    multiproc = jax.process_count() > 1
    compact_enabled, eblock = apply_pinned_rung(
        os.environ.get("SLDPC_MESH_RUNG"), compact_enabled, eblock
    )
    programs: dict = {}  # ladder rung -> compiled shard_map program

    def _seeds(idx):
        return jnp.asarray(device_seeds(base_seed, idx, n_dev))

    def run_compact(p, idx):
        if "compact" not in programs:
            programs["compact"] = sharded_seed_counters(
                mesh,
                lambda pp, s: fused_counters_edge_compact(
                    code, pp, variant, num_iterations, snr_db, batch,
                    seed=s, t1=t1, block_frames=cblock,
                    schedule=DEFAULT_COMPACT_SCHEDULE,
                ),
            )
        return np.asarray(programs["compact"](p, _seeds(idx)))

    def run_oneshot(p, idx, blk):
        key = ("oneshot", blk)
        if key not in programs:
            programs[key] = sharded_seed_counters(
                mesh,
                lambda pp, s: fused_counters_edge(
                    code, pp, variant, num_iterations, snr_db, batch,
                    seed=s, block_frames=blk,
                ),
            )
        return np.asarray(programs[key](p, _seeds(idx)))

    def run_xla():
        xla = sharded_nms_mc_step(
            code, variant, num_iterations, spec, batch, mesh
        )
        return lambda p, key: (np.asarray(xla(p, key)), None)

    return build_ladder_step(
        batch=batch, eblock=eblock, compact_enabled=compact_enabled,
        attempt=attempt_multiproc if multiproc else _attempt_fused,
        run_compact=run_compact, run_oneshot=run_oneshot, run_xla=run_xla,
        warn_suffix=f" (sharded, {n_dev} devices)",
    )


def sharded_dl_osd_step_from_llr(
    model,
    code: Code,
    variant: str,
    num_iterations: int,
    mesh: Mesh,
    window: int = 5,
    soft_margin: float = 0.9,
    bounds: tuple | None = None,
    use_kernel: bool | None = None,
):
    """Mesh-parallel RAW-LLR phase-2 step — the r5 system path's fused
    re-decode -> DIA -> walk with the failure batch sharded over the mesh
    and only psum'd counters replicated out.

    The in-step trajectory re-decode is the XLA decoder (batch-partitioned
    by the sharding constraint like every other stage; the VMEM trajectory
    kernel variant of the single-device path would need a shard_map
    wrapper — the counters here are correctness-bearing, so the bit-exact
    decoder is the right default on a mesh anyway).  Same no-demotion
    policy as ``sharded_dl_osd_step``.

    Returns ``step(nms_params, dia_params, llr, labels, teps, mask, acc,
    fcn_params)`` -> (5,) replicated counters
    ``[rows, detected, success_detected, total_teps, total_windows]``."""
    from ..ops import nms as nms_ops
    from ..osd import engine

    axis = mesh.axis_names[0]
    batch_sharding = _sharding(mesh, axis)
    replicated = _sharding(mesh)
    decode_h = code.extended().h if variant == "ENMS" else code.h
    h_dec = jnp.asarray(decode_h, jnp.float32)
    h_osd = jnp.asarray(code.h_osd)
    edge_cols = (
        jnp.asarray(nms_ops.edge_columns(decode_h))
        if variant == "NMS-r" else None
    )
    k = code.k

    @functools.partial(jax.jit, out_shardings=replicated)
    def step(nms_params, dia_params, llr, labels, teps, mask, acc,
             fcn_params):
        llr = jax.lax.with_sharding_constraint(llr, batch_sharding)
        labels = jax.lax.with_sharding_constraint(labels, batch_sharding)
        outs = nms_ops.decode(
            nms_params, h_dec, llr, num_iterations, variant, edge_cols
        )
        traj = jnp.transpose(outs, (1, 0, 2))
        st = nms_ops.frame_stats(traj[:, -1], labels, h_dec)
        det = st["detected_failure"]
        refined = model.refine_fast(dia_params, traj)
        prep = engine.prepare(refined, llr, labels, h_osd, k)
        out = engine.sliding_osd(
            prep, teps, mask, acc, fcn_params, k,
            window=window, soft_margin=soft_margin, bounds=bounds,
            use_kernel=use_kernel,
        )
        cdt = count_dtype()
        return jnp.stack([
            jnp.asarray(llr.shape[0], cdt),
            jnp.sum(det.astype(cdt)),
            jnp.sum((out["success"] & det).astype(cdt)),
            jnp.sum(jnp.where(det, out["complexity"], 0).astype(cdt)),
            jnp.sum(jnp.where(det, out["window_num"], 0).astype(cdt)),
        ])

    return step


def sharded_nms_train_step(
    code: Code,
    variant: str,
    num_iterations: int,
    spec: ChannelSpec,
    per_device_batch: int,
    mesh: Mesh,
    learning_rate: float = 0.01,
    decay_steps: int = 500,
    decay_rate: float = 0.95,
    clip_norm: float = 5.0,
):
    """Data-parallel NMS training step over the mesh.

    Returns (tx, step_fn) where step_fn(params, opt_state, key) ->
    (params, opt_state, loss).  Gradients all-reduce automatically from the
    batch sharding."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    total_batch = per_device_batch * n_dev
    train_h = code.extended().h if variant == "ENMS" else code.h
    h = jnp.asarray(train_h, jnp.float32)
    gen = jnp.asarray(code.g, jnp.float32)
    edge_cols = (
        jnp.asarray(nms.edge_columns(train_h)) if variant == "NMS-r" else None
    )
    tx = staircase_adam(learning_rate, decay_steps, decay_rate, clip_norm)
    batch_sharding = _sharding(mesh, axis)
    replicated = _sharding(mesh)

    # same large-code rung selection as the single-device trainer
    # (shape+backend-driven, host-uniform)
    from ..ops.nms_edge_xla import auto_select as _t_edge_xla_auto

    _th_np = np.asarray(train_h)
    train_edge_xla = _t_edge_xla_auto(_th_np, variant)

    def loss_fn(params, llr, words):
        if train_edge_xla:
            from ..ops.nms_edge_xla import decode_edge_xla

            outs = decode_edge_xla(
                params, _th_np, llr, num_iterations, variant, mode="highest"
            )
        else:
            outs = nms.decode(
                params, h, llr, num_iterations, variant, edge_cols
            )
        return nms.multi_iteration_loss(outs, words)

    @functools.partial(jax.jit, out_shardings=(replicated, replicated, replicated))
    def step(params, opt_state, key):
        llr, words = sample_batch(key, spec, gen, total_batch)
        llr = jax.lax.with_sharding_constraint(llr, batch_sharding)
        words = jax.lax.with_sharding_constraint(words, batch_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(params, llr, words)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return tx, step


def sharded_dl_osd_step(
    model,
    h,
    k: int,
    mesh: Mesh,
    window: int = 5,
    soft_margin: float = 0.9,
    bounds: tuple | None = None,
    use_kernel: bool | None = None,
):
    """DL-OSD evaluation step with the failure batch sharded over the mesh.

    Phase 2 is per-frame independent like the Monte-Carlo sweep, so the
    whole refine -> prepare -> sliding_osd program partitions on the batch
    axis: the TEP chunks / DIA / stopper params replicate, the per-frame
    sort/GE/scan work shards, and the returned counters
    ``[success, failure, total_teps, total_windows]`` reduce with psum.
    (Reference has no distribution at all — SURVEY.md §2 "Parallel" rows.)

    Returns ``step(dia_params, traj, labels, teps, mask, acc, fcn_params)``
    -> (4,) counters, replicated.  Unlike ``engine.make_dl_osd_step`` there
    is NO host-level kernel demotion here: demotion is host-local state and
    would diverge collective programs across hosts (same policy as the MC
    ladder) — a fused-kernel failure on a mesh raises instead.  Pin the
    discrepancy path uniformly with ``use_kernel`` (False = chunk scan)
    when the fused kernel is known not to fit a code's shapes."""
    from ..osd import engine

    axis = mesh.axis_names[0]
    batch_sharding = _sharding(mesh, axis)
    replicated = _sharding(mesh)
    h = jnp.asarray(h)

    @functools.partial(jax.jit, out_shardings=replicated)
    def step(dia_params, traj, labels, teps, mask, acc, fcn_params):
        traj = jax.lax.with_sharding_constraint(traj, batch_sharding)
        labels = jax.lax.with_sharding_constraint(labels, batch_sharding)
        refined = model.refine_fast(dia_params, traj)
        prep = engine.prepare(refined, traj[:, 0], labels, h, k)
        out = engine.sliding_osd(
            prep, teps, mask, acc, fcn_params, k,
            window=window, soft_margin=soft_margin, bounds=bounds,
            use_kernel=use_kernel,
        )
        succ = out["success"]
        cdt = count_dtype()  # int64 iff x64 enabled — see utils/dtypes.py
        return jnp.stack(
            [
                jnp.sum(succ.astype(cdt)),
                jnp.sum((~succ).astype(cdt)),
                jnp.sum(out["complexity"].astype(cdt)),
                jnp.sum(out["windows_evaluated"].astype(cdt)),
            ]
        )

    return step
