"""One fused-kernel demotion ladder for both the single-device harness and
the mesh path.

Round 3 shipped the ladder twice (``mc/harness.py`` and
``parallel/data_parallel.py``) with acknowledged drift risk: a rung change
had to be made in two places and could silently disagree between the benched
path and the mesh path.  This module is the single source of truth for the
rung ORDER and demotion rules; the policy differences between the callers
are explicit parameters:

* ``run_*``: how a rung's kernel call is issued — the harness calls the
  fused kernels directly, the mesh path wraps each rung in a cached
  shard_map program with psum'd counters.
* ``attempt``: error triage.  Single-device: demote / transient-retry /
  raise (``harness._attempt_fused``).  Multi-process mesh: transient errors
  retry once (re-issuing the identical compiled program is uniform across
  hosts), everything else RAISES — host-local demotion would issue different
  collective programs on different hosts in the same step, a deadlock in
  JAX's multi-controller model (``attempt_multiproc``).
* ``run_dense``: optional dense-kernel rung between the edge rungs and the
  XLA step; only the single-device path has one (the dense kernel has no
  shard_map wrapper) and only uses it when the edge layout never fit
  (eblock < 8), mirroring the historical behavior.

Rung order (identical for every caller):
  compact edge kernel (in-kernel convergence compaction; an overflowed
  block is REDONE one-shot and the ladder stays one-shot — overflowed
  frames are judged at t1, which would bias FER upward if kept)
  -> one-shot edge kernel with block halving
  -> [dense kernel, single-device only, when edge never fit]
  -> plain XLA step.
"""

from __future__ import annotations

import warnings


def ladder_blocks(code, batch: int, num_iterations: int, t1: int = 4):
    """Shared block-size / rung-eligibility derivation.

    Returns (eblock, cblock, compact_enabled).  Both callers must use this
    so the benched single-device rungs and the mesh rungs agree."""
    from ..ops.nms_edge_pallas import (
        DEFAULT_COMPACT_SCHEDULE,
        auto_block_frames as edge_auto,
    )

    dc = int(code.h.sum(axis=1).max())
    eblock = edge_auto(code.m, code.n, dc)
    while eblock >= 8 and batch % eblock:
        eblock //= 2
    cfrac = DEFAULT_COMPACT_SCHEDULE[0][1]
    cblock = edge_auto(code.m, code.n, dc, compact_frac=cfrac)
    while cblock >= 8 and batch % cblock:
        cblock //= 2
    compact_enabled = num_iterations > t1 + 1 and cblock >= 128
    return eblock, cblock, compact_enabled


def attempt_multiproc(call, desc: str):
    """Multi-process triage: one transient retry (same compiled program —
    uniform across hosts), raise on everything else (see module docstring)."""
    from .harness import _kernel_error_kind

    for attempt in (0, 1):
        try:
            return "ok", call()
        except Exception as e:  # noqa: BLE001 — triaged below
            if _kernel_error_kind(e) == "transient" and attempt == 0:
                warnings.warn(
                    f"{desc} hit a transient TPU error ({str(e)[:200]}); "
                    "retrying once (multi-process: demotion disabled)"
                )
                continue
            raise


def apply_pinned_rung(pinned: str | None, compact_enabled: bool, eblock: int):
    """``SLDPC_MESH_RUNG``-style pre-pinning: returns possibly-lowered
    (compact_enabled, eblock).  'compact' keeps the full ladder, 'oneshot'
    skips the compact rung, 'xla' skips every fused rung."""
    if pinned in (None, "", "compact"):
        return compact_enabled, eblock
    if pinned == "oneshot":
        return False, eblock
    if pinned == "xla":
        return False, 0
    raise ValueError(
        f"unknown rung {pinned!r}; expected compact|oneshot|xla"
    )


def build_ladder_step(
    *,
    batch: int,
    eblock: int,
    compact_enabled: bool,
    attempt,
    run_compact,  # (params, idx) -> counters (6,) ndarray  [.., overflow]
    run_oneshot,  # (params, idx, blk) -> counters (5,) ndarray
    run_xla,  # () -> fn(params, key) -> (counters, capture)
    run_dense=None,  # (params, idx) -> counters (5,) ndarray, optional
    warn_suffix: str = "",
):
    """Returns ``step(params, key, idx) -> (counters (5,), capture|None)``
    walking the documented rung order with permanent host-side demotion."""
    state = {
        "compact": compact_enabled,
        "eblock": eblock,
        "dense": run_dense is not None and eblock < 8,
        "xla": None,
    }

    def step(params, key, idx):
        if state["xla"] is not None:
            return state["xla"](params, key)
        if state["compact"]:
            status, c = attempt(
                lambda: run_compact(params, idx),
                "compact MC kernel" + warn_suffix,
            )
            if status == "ok" and c[5] == 0.0:
                return c[:5], None
            # overflow or failure: redo one-shot, stay one-shot
            state["compact"] = False
        while state["eblock"] >= 8:
            blk = state["eblock"]
            status, c = attempt(
                lambda: run_oneshot(params, idx, blk),
                f"one-shot edge MC kernel (block {blk})" + warn_suffix,
            )
            if status == "ok":
                return c, None
            state["eblock"] //= 2
            while state["eblock"] >= 8 and batch % state["eblock"]:
                state["eblock"] //= 2
        if state["dense"]:
            status, c = attempt(
                lambda: run_dense(params, idx),
                "dense MC kernel" + warn_suffix,
            )
            if status == "ok":
                return c, None
            state["dense"] = False
        warnings.warn(
            "fused MC kernels unavailable; using the plain XLA MC step"
            + warn_suffix
        )
        state["xla"] = run_xla()
        return state["xla"](params, key)

    return step
