"""Deliberate counter-dtype policy (round-3 VERDICT weak #7).

The Monte-Carlo counters are per-STEP sums: even the 2^21-frame bench batch
keeps every counter far below 2^31, and the harness accumulates across steps
in Python ints (``DecodeStats``), which never overflow.  Requesting int64
unconditionally therefore bought nothing but a "int64 truncated to int32"
UserWarning on every trace (~20 per test run), drowning real warnings.

``count_dtype()`` picks int64 only when x64 is actually enabled — evaluated
at trace time, so a pod whose per-step sums could exceed 2^31 enables it
with the standard ``JAX_ENABLE_X64=1`` flag flip and every counter stack
follows, with no code change and no spurious warning either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def count_dtype():
    """int64 iff jax_enable_x64 is on (trace-time decision)."""
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
