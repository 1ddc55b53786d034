"""Single-host Monte-Carlo FER harness.

Replaces the reference's file-mediated test loop
(``Ldpc_128_testing/ldpc_128_testing.py:99-153``): frames are generated,
decoded and reduced fully on device; the host only polls scalar counters to
apply the error-budget early stop (40k frame errors for NMS, 500/100 failures
for the OSD stages).  Failed frames are compacted on device into a
fixed-capacity buffer (sort-by-flag + gather) instead of TFRecord files —
SURVEY.md §7 decision 6 — with overflow accounted, never silently dropped.

The multi-device version lives in ``parallel/data_parallel.py``.
"""

from __future__ import annotations

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..channel import ChannelSpec, sample_batch
from ..codes import Code
from ..ops import nms
from ..utils.dtypes import count_dtype
from ..utils.metrics import DecodeStats


# Fused-kernel error triage (the blanket ``except Exception`` it replaces
# silently converted multi-hour sweeps to the ~25x-slower XLA step on ANY
# error, including programming errors).  Three classes:
#   'demote'    compile/VMEM/lowering failures — the VMEM fit model in
#               ``auto_block_frames`` is calibrated, not exact, so these are
#               expected and walk the fallback ladder;
#   'transient' known-flaky TPU runtime errors on this host (e.g.
#               FAILED_PRECONDITION on transfer) — retry the same config once
#               before demoting;
#   'raise'     everything else (ValueError from schedule validation, shape
#               bugs, ...) — programming errors must surface, not hide behind
#               a misleading "VMEM failure" warning.
_DEMOTE_SUBSTRINGS = (
    "mosaic", "vmem", "resource_exhausted", "resource exhausted", "scoped",
    "scratch", "lowering", "not found for platform", "out of memory",
    "only interpret mode",
)
_TRANSIENT_SUBSTRINGS = (
    "failed_precondition", "failed precondition", "unavailable",
    "deadline", "backend error", "aborted",
)


def _kernel_error_kind(e: Exception) -> str:
    # message substrings first: some compile/lowering failures surface as
    # ValueError (e.g. "Only interpret mode is supported on CPU backend"),
    # so the type alone cannot decide
    msg = f"{type(e).__name__} {e}".lower()
    if any(s in msg for s in _TRANSIENT_SUBSTRINGS):
        return "transient"
    if any(s in msg for s in _DEMOTE_SUBSTRINGS) or isinstance(
        e, NotImplementedError
    ):
        return "demote"
    if "xlaruntimeerror" in type(e).__name__.lower():
        # INVALID_ARGUMENT is a programming error (bad runtime shape/buffer),
        # not an infra hiccup — surface it instead of silently demoting the
        # whole sweep to the ~25x-slower XLA step
        if "invalid_argument" in msg or "invalid argument" in msg:
            return "raise"
        return "demote"
    return "raise"


def _attempt_fused(call, desc: str):
    """Run a fused-kernel call with triage; returns ('ok', value) or
    ('demote', None).  Transient TPU errors get one same-config retry;
    programming errors propagate."""
    for attempt in (0, 1):
        try:
            return "ok", call()
        except Exception as e:  # noqa: BLE001 — triaged below
            kind = _kernel_error_kind(e)
            if kind == "raise":
                raise
            if kind == "transient" and attempt == 0:
                warnings.warn(
                    f"{desc} hit a transient TPU error ({str(e)[:200]}); "
                    "retrying once"
                )
                continue
            warnings.warn(f"{desc} failed ({str(e)[:200]}); demoting")
            return "demote", None


@dataclasses.dataclass
class FailureBatch:
    """Host-side copy of captured decoder failures (detected, syndrome != 0)."""

    trajectories: np.ndarray  # (count, T+1, n) per-iteration soft outputs
    labels: np.ndarray  # (count, n) transmitted codewords
    overflow: int  # failures that did not fit the capture buffer
    # frames the capture kernel flagged but the bit-exact XLA re-decode did
    # not confirm as detected failures (f32-rounding ties between the edge
    # kernel and the XLA decoder); dropped from the batch, counted here.
    # NOTE this counts only FALSE POSITIVES of the flagging kernel: frames
    # the XLA re-decode would flag but the kernel did not are never captured
    # and are not counted, so the kernel/XLA disagreement is understated and
    # the capture set carries a small one-directional selection bias (the
    # stats counters likewise remain the flagging kernel's)
    mismatches: int = 0
    # False in raw-capture mode (run_nms_mc(capture_trajectories=False)):
    # trajectories then hold only the (count, 1, n) channel LLR rows, the
    # bit-exact confirmation re-decode was SKIPPED, and the consumer (the
    # fused osd.engine.make_dl_osd_step_from_llr step) re-decodes on device
    # and returns per-frame detected flags instead
    confirmed: bool = True


# (code.name, variant, iters, batch, capacity, all_zeros, spec-structure,
#  backend) -> jitted step.  The AWGN (mean, sigma) are RUNTIME scalars, so
# one compile serves a whole SNR sweep — per-point retrace/recompile was the
# capture path's dominant cost (r3: NMS eval with capture ran at 4-45k f/s
# while the decode itself is ~5 ms of real work per point).
_STEP_CACHE: dict = {}


def _matrix_digest(*mats) -> str:
    """Content digest of the matrices a cached jitted step closes over.

    Cache keys used to be (code.name, n, m, ...) only; a Code with the same
    name and shape but different H/G (e.g. a programmatically punctured
    variant) would silently reuse a step with the wrong matrices baked in.
    """
    import hashlib

    h = hashlib.sha1()
    for m in mats:
        a = np.ascontiguousarray(np.asarray(m))
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()[:16]


def build_nms_mc_step(
    code: Code,
    variant: str,
    num_iterations: int,
    spec: ChannelSpec,
    batch: int,
    capture_capacity: int = 0,
    all_zeros: bool = False,
    use_pallas: bool | None = None,
    use_edge_xla: bool | None = None,
):
    """Build a (params, key) -> (counters, capture) Monte-Carlo step.

    counters = [frames, frame_errors, bit_errors, detected, undetected].
    ``use_pallas`` selects the fused VMEM kernel (default: automatically on
    TPU for the scalar variants).  ``use_edge_xla`` selects the edge-layout
    pure-XLA rung (``ops/nms_edge_xla``) — the large-code fast path for
    codes whose incidence constants exceed the VMEM kernels' envelope
    (default: automatically on TPU for scalar variants when no VMEM kernel
    fits; 41x over the dense XLA step for WiMAX (1056, 880), Precision.HIGH
    matmuls so counters can drift from the bit-exact dense decoder by f32
    borderline frames — the same contract as the VMEM kernels' split mode).
    In capture mode the step runs the fastest
    available kernel and captures flagged frames' channel LLRs; the harness
    re-derives their trajectories with the bit-exact XLA decoder and drops
    any frame that re-decode does not confirm as a detected failure, so the
    capture set is exact even when the flagging kernel differs from the XLA
    decoder by f32 rounding."""
    decode_h = code.extended().h if variant == "ENMS" else code.h
    from ..ops.nms_edge_pallas import auto_block_frames as edge_auto
    from ..ops.nms_pallas import auto_block_frames

    dc = int(np.asarray(decode_h).sum(axis=1).max())
    edge_block = edge_auto(decode_h.shape[0], code.n, dc)
    while edge_block >= 8 and batch % edge_block:
        edge_block //= 2
    pallas_block = auto_block_frames(decode_h.shape[0], code.n)
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and variant != "NMS-r"
            and (
                edge_block >= 8
                or (pallas_block >= 8 and batch % pallas_block == 0)
            )
        )
    use_edge = use_pallas and edge_block >= 8
    if use_pallas and not use_edge and not (
        pallas_block >= 8 and batch % pallas_block == 0
    ):
        use_pallas = False
    if use_edge_xla is None:
        from ..ops.nms_edge_xla import auto_select as _edge_xla_auto

        # fit-based, NOT "not use_pallas": a small code whose VMEM kernels
        # fit but whose batch is merely indivisible stays on the bit-exact
        # dense decoder (the documented contract)
        use_edge_xla = not use_pallas and _edge_xla_auto(decode_h, variant)

    # a plain-AWGN spec's (mean, sigma) pass at run time; any other spec
    # structure (rayleigh / SNR blend) is baked into the compiled step
    runtime_moments = not spec.rayleigh
    cache_key = (
        code.name, code.n, code.m, _matrix_digest(decode_h, code.g),
        variant, num_iterations, batch,
        capture_capacity, all_zeros, use_edge, use_pallas, use_edge_xla,
        (spec if not runtime_moments else None), jax.default_backend(),
    )
    if cache_key in _STEP_CACHE:
        inner = _STEP_CACHE[cache_key]
    else:
        h = jnp.asarray(decode_h, jnp.float32)
        gen = jnp.asarray(code.g, jnp.float32)
        edge_cols = (
            jnp.asarray(nms.edge_columns(decode_h))
            if variant == "NMS-r"
            else None
        )
        decode_h_host = np.asarray(decode_h)

        @jax.jit
        def inner(params, key, mean, sigma):
            sp = (
                dataclasses.replace(spec, mean=mean, sigma=sigma)
                if runtime_moments
                else spec
            )
            llr, words = sample_batch(key, sp, gen, batch, all_zeros=all_zeros)
            if use_edge:
                from ..ops.nms_edge_pallas import decode_final_edge

                soft_last = decode_final_edge(
                    params, decode_h_host, llr, num_iterations, variant,
                    block_frames=edge_block,
                )
            elif use_pallas:
                from .. import ops

                soft_last = ops.nms_pallas.decode_final_pallas(
                    params, h, llr, num_iterations, variant,
                    block_frames=pallas_block,
                )
            elif use_edge_xla:
                from ..ops.nms_edge_xla import decode_final_edge_xla

                soft_last = decode_final_edge_xla(
                    params, decode_h_host, llr, num_iterations, variant,
                    mode="high",
                )
            else:
                soft_last = nms.decode_final(
                    params, h, llr, num_iterations, variant, edge_cols
                )
            st = nms.frame_stats(soft_last, words, h)
            cdt = count_dtype()  # int64 iff x64 enabled — see utils/dtypes.py
            counters = jnp.stack(
                [
                    jnp.asarray(batch, cdt),
                    jnp.sum(st["frame_error"].astype(cdt)),
                    jnp.sum(st["bit_errors"].astype(cdt)),
                    jnp.sum(st["detected_failure"].astype(cdt)),
                    jnp.sum(st["undetected_error"].astype(cdt)),
                ]
            )
            if not capture_capacity:
                return counters, None
            # capture only the failures' channel LLRs; their full iteration
            # trajectories are re-derived later in one batched re-decode (the
            # decode is deterministic), so the fast final-only kernel serves
            # the Monte-Carlo loop even in capture mode
            flag = st["detected_failure"]
            order = jnp.argsort(jnp.logical_not(flag), stable=True)
            take = order[:capture_capacity]  # failures first
            capture = {
                "count": jnp.sum(flag.astype(jnp.int32)),
                "llr": llr[take],
                "labels": words[take],
            }
            return counters, capture

        _STEP_CACHE[cache_key] = inner

    mean = jnp.float32(spec.mean)
    sigma = jnp.float32(spec.sigma)

    def step(params, key):
        return inner(params, key, mean, sigma)

    return step


_REDECODE_CACHE: dict = {}


def trajectories_for_llrs(
    code: Code,
    params: dict,
    variant: str,
    num_iterations: int,
    llrs: np.ndarray,
    chunk: int = 4096,
) -> np.ndarray:
    """Re-decode captured failure LLRs with the trajectory-stacking path,
    returning (N, T+1, n) per-iteration soft outputs."""
    decode_h = code.extended().h if variant == "ENMS" else code.h
    n_total = len(llrs)
    if n_total == 0:
        return np.zeros((0, num_iterations + 1, code.n), np.float32)
    pad = (-n_total) % chunk
    cache_key = (
        code.name, code.n, code.m, _matrix_digest(decode_h),
        variant, num_iterations, chunk,
    )
    if cache_key in _REDECODE_CACHE:
        redecode = _REDECODE_CACHE[cache_key]
    else:
        h = jnp.asarray(decode_h, jnp.float32)
        edge_cols = (
            jnp.asarray(nms.edge_columns(decode_h))
            if variant == "NMS-r"
            else None
        )

        @jax.jit
        def redecode(params, x):
            outs = nms.decode(params, h, x, num_iterations, variant, edge_cols)
            return jnp.transpose(outs, (1, 0, 2))

        _REDECODE_CACHE[cache_key] = redecode

    padded = np.concatenate(
        [llrs, np.zeros((pad, code.n), np.float32)], axis=0
    )
    parts = [
        np.asarray(redecode(params, jnp.asarray(padded[i : i + chunk])))
        for i in range(0, len(padded), chunk)
    ]
    return np.concatenate(parts)[:n_total]


def detected_failure_mask(
    code: Code, variant: str, trajectories: np.ndarray
) -> np.ndarray:
    """Host-side detected-failure flags from re-decoded trajectories.

    Matches ``nms.frame_stats``'s rule (reference ``ms_test.py:36-54``):
    a detected failure is a nonzero syndrome of the final iteration's hard
    decision, measured against the decoding H (extended for ENMS)."""
    decode_h = np.asarray(
        code.extended().h if variant == "ENMS" else code.h, np.int64
    )
    hard = (trajectories[:, -1] < 0).astype(np.int64)  # frame_stats' rule
    syndrome = hard @ decode_h.T % 2
    return syndrome.any(axis=1)


def run_nms_mc(
    code: Code,
    params: dict,
    variant: str,
    num_iterations: int,
    snr_db: float,
    batch: int = 1024,
    error_budget: int = 40_000,
    max_frames: int = 10**8,
    seed: int = 0,
    capture_failures: bool = False,
    capture_limit: int = 100_000,
    capture_trajectories: bool = True,
    spec: ChannelSpec | None = None,
    progress: bool = False,
    mesh=None,
    resume_path: str | None = None,
) -> tuple[DecodeStats, FailureBatch | None]:
    """Monte-Carlo FER sweep at one SNR point with error-budget early stop.

    Mirrors the stage-5 semantics: stop when total frame errors exceed
    ``error_budget`` or ``max_frames`` frames were decoded
    (``ldpc_128_testing.py:36,130-131``).

    * ``mesh``: optional ``jax.sharding.Mesh`` — frames shard over its 'mc'
      axis (``batch`` then counts per-device frames); capture is only
      supported on the single-device path.
    * ``resume_path``: optional json file persisting (step_idx, counters) so
      multi-hour sweeps survive pre-emption (SURVEY.md §5 failure-recovery
      row); both the jax.random path and the fused in-kernel PRNG derive
      their stream from the step index, so resuming reproduces exactly the
      frames that would have followed (no re-consumed seeds)."""
    spec = spec or ChannelSpec.awgn(snr_db, code.rate)
    capacity = min(batch, capture_limit) if capture_failures else 0
    fused_ok = (
        not capture_failures
        and jax.default_backend() == "tpu"
        and variant not in ("NMS-r", "ENMS")
        and spec == ChannelSpec.awgn(snr_db, code.rate)
        and batch % 32 == 0
    )
    use_fused = fused_ok and mesh is None
    if use_fused:
        # fully fused in-kernel Monte-Carlo (own PRNG stream; statistically
        # equivalent to the jax.random path); the edge-compact kernel is ~4x
        # the dense one and is preferred whenever its layout fits VMEM.
        # Rung order + demotion rules live ONCE in mc/ladder.py, shared with
        # the mesh path; this caller supplies direct-call rung runners and
        # the single-device error triage.  The VMEM fit model in
        # auto_block_frames is calibrated, not exact (Mosaic's scoped
        # allocation for large edge counts exceeds any linear estimate), so
        # every fused kernel is guarded at runtime: a compile failure
        # demotes compact -> one-shot -> halved blocks -> the plain XLA
        # step, preserving the sweep instead of crashing it.
        from ..ops.mc_pallas import fused_counters
        from ..ops.nms_edge_pallas import (
            DEFAULT_COMPACT_SCHEDULE,
            fused_counters_edge,
            fused_counters_edge_compact,
        )
        from ..ops.nms_pallas import auto_block_frames
        from .ladder import build_ladder_step, ladder_blocks

        t1 = 4
        eblock, cblock, compact_enabled = ladder_blocks(
            code, batch, num_iterations, t1
        )
        block = auto_block_frames(code.m, code.n)
        dense_ok = block >= 8 and batch % block == 0
        if eblock >= 8 or dense_ok:

            def _kseed(idx):
                # fused-kernel seeds are positional in the STEP INDEX (not a
                # process-local counter), so a resumed sweep continues the
                # PRNG streams instead of re-consuming seeds 0..N; masked
                # into int32 range (the kernel seed word is int32)
                return (seed * 100003 + idx) & 0x7FFFFFFF

            def run_compact(p, idx):
                return np.asarray(fused_counters_edge_compact(
                    code, p, variant, num_iterations, snr_db, batch,
                    seed=_kseed(idx), t1=t1, block_frames=cblock,
                    schedule=DEFAULT_COMPACT_SCHEDULE,
                ))

            def run_oneshot(p, idx, blk):
                return np.asarray(fused_counters_edge(
                    code, p, variant, num_iterations, snr_db, batch,
                    seed=_kseed(idx), block_frames=blk,
                ))

            run_dense = None
            if dense_ok:
                def run_dense(p, idx):
                    return np.asarray(fused_counters(
                        code, p, variant, num_iterations, snr_db, batch,
                        seed=_kseed(idx), block_frames=block,
                    ))

            def run_xla():
                # the ladder's last rung stays the bit-exact dense decoder
                # (rung-parity tests and the capture-confirm contract key
                # on it), so the edge-XLA fast rung is explicitly off here
                return build_nms_mc_step(
                    code, variant, num_iterations, spec, batch,
                    capture_capacity=capacity, use_pallas=False,
                    use_edge_xla=False,
                )

            step = build_ladder_step(
                batch=batch, eblock=eblock, compact_enabled=compact_enabled,
                attempt=_attempt_fused, run_compact=run_compact,
                run_oneshot=run_oneshot, run_xla=run_xla,
                run_dense=run_dense,
            )
        else:
            use_fused = False
    if mesh is not None:
        if capture_failures:
            raise ValueError("failure capture requires the single-device path")
        if fused_ok:
            # the fused edge kernels on every device of the mesh (per-chip
            # throughput matches the single-chip kernels; counters psum over
            # ICI); demotes to the sharded XLA step only if they can't lower
            from ..parallel import sharded_fused_mc_step

            step = sharded_fused_mc_step(
                code, variant, num_iterations, snr_db, batch, mesh,
                base_seed=seed, spec=spec,
            )
        else:
            from ..parallel import sharded_nms_mc_step

            step_sharded = sharded_nms_mc_step(
                code, variant, num_iterations, spec, batch, mesh
            )
            step = lambda p, k, i: (step_sharded(p, k), None)
    elif not use_fused:
        built = build_nms_mc_step(
            code, variant, num_iterations, spec, batch, capture_capacity=capacity
        )
        step = lambda p, k, i: built(p, k)
    key = jax.random.PRNGKey(seed)
    stats = DecodeStats(bits_per_frame=code.n)
    traj_list: list[np.ndarray] = []
    label_list: list[np.ndarray] = []
    overflow = 0
    captured_total = 0
    step_idx = 0
    if resume_path is not None:
        import json
        import os

        if os.path.exists(resume_path):
            with open(resume_path) as fh:
                saved = json.load(fh)
            if saved.get("seed") == seed and saved.get("snr_db") == snr_db:
                step_idx = saved["step_idx"]
                stats = DecodeStats(**saved["stats"])
    while stats.frames < max_frames and stats.frame_errors <= error_budget:
        counters, capture = step(params, jax.random.fold_in(key, step_idx), step_idx)
        step_idx += 1
        c = np.asarray(counters)
        stats = stats.merge(
            DecodeStats(
                frames=int(c[0]),
                frame_errors=int(c[1]),
                bit_errors=int(c[2]),
                bits_per_frame=code.n,
                detected_failures=int(c[3]),
                undetected_errors=int(c[4]),
            )
        )
        if capture is not None:
            count = int(capture["count"])
            fit = min(count, capacity)
            room = max(0, capture_limit - captured_total)
            keep = min(fit, room)
            overflow += count - keep
            if keep:
                traj_list.append(np.asarray(capture["llr"][:keep]))
                label_list.append(np.asarray(capture["labels"][:keep]))
                captured_total += keep
        if progress:
            print(
                f"  snr={snr_db:.2f} frames={stats.frames} "
                f"FER={stats.fer:.3e} failures={stats.detected_failures}",
                flush=True,
            )
        if resume_path is not None and step_idx % 50 == 0:
            _write_resume(resume_path, seed, snr_db, step_idx, stats)
    if resume_path is not None:
        _write_resume(resume_path, seed, snr_db, step_idx, stats)
    failures = None
    if capture_failures:
        if traj_list:
            llrs = np.concatenate(traj_list)
            labels = np.concatenate(label_list)
            if not capture_trajectories:
                # raw mode: hand off only the (N, n) channel rows; the
                # consumer re-decodes on device (see FailureBatch.confirmed)
                failures = FailureBatch(
                    trajectories=llrs[:, None, :],
                    labels=labels,
                    overflow=overflow,
                    confirmed=False,
                )
                return stats, failures
            traj = trajectories_for_llrs(
                code, params, variant, num_iterations, llrs
            )
            # the capture kernel may be the fast edge kernel, whose failure
            # flags agree with the XLA decoder only to f32 rounding; keep
            # exactly the frames the bit-exact re-decode confirms
            keep = detected_failure_mask(code, variant, traj)
            mismatches = int((~keep).sum())
            if mismatches:
                traj, labels = traj[keep], labels[keep]
            failures = FailureBatch(
                trajectories=traj,
                labels=labels,
                overflow=overflow,
                mismatches=mismatches,
            )
        else:
            rows = num_iterations + 1 if capture_trajectories else 1
            failures = FailureBatch(
                trajectories=np.zeros((0, rows, code.n), np.float32),
                labels=np.zeros((0, code.n), np.int32),
                overflow=overflow,
                confirmed=capture_trajectories,
            )
    return stats, failures


def _write_resume(path: str, seed: int, snr_db: float, step_idx: int, stats: DecodeStats):
    import dataclasses
    import json

    with open(path, "wt") as fh:
        json.dump(
            {
                "seed": seed,
                "snr_db": snr_db,
                "step_idx": step_idx,
                "stats": dataclasses.asdict(stats),
            },
            fh,
        )


def iteration_ce_list(trajectories: np.ndarray, labels: np.ndarray) -> list[float]:
    """Per-iteration cross-entropy over a failure set (``ms_test.py:251-267``)."""
    logits = -trajectories.astype(np.float64)  # (N, T+1, n)
    z = labels[:, None, :].astype(np.float64)
    ce = np.maximum(logits, 0) - logits * z + np.log1p(np.exp(-np.abs(logits)))
    return [float(x) for x in ce.sum(axis=(0, 2))]


def iteration_ber_list(trajectories: np.ndarray, labels: np.ndarray) -> list[float]:
    """Per-iteration bit error rate over a failure set (the reference's BER
    bookkeeping alongside the CE list, ``nn_testing.py:205-210``)."""
    hard = trajectories <= 0
    err = hard != (labels[:, None, :] > 0)
    denom = max(trajectories.shape[0] * trajectories.shape[2], 1)
    return [float(x) / denom for x in err.sum(axis=(0, 2))]
