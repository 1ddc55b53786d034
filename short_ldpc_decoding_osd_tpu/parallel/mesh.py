"""Device-mesh construction for the Monte-Carlo scaling axis.

The reference has no distribution whatsoever (single-process eager TF,
SURVEY.md §2/§5).  For this workload the scaling axis is the Monte-Carlo
codeword batch: frames shard over every chip ('mc' axis spanning ICI inside a
slice and DCN across slices); statistics reduce with ``psum`` which XLA
inserts automatically from sharding annotations.  Model parameters (1-3
scalars + tiny NNs) are replicated everywhere."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_name: str = "mc") -> Mesh:
    """1-D mesh over the first ``n_devices`` visible devices."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} visible"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def init_multihost(
    coordinator: str | None = None,
    num_processes: int = 1,
    process_id: int = 0,
):
    """Initialize ``jax.distributed`` for multi-host pods.

    No-op for a single process (``num_processes <= 1`` or no coordinator) —
    and deliberately does NOT touch ``jax.process_count()``/devices first,
    which would initialize the local backend and make a subsequent
    ``jax.distributed.initialize`` fail.  Call before any other JAX API."""
    if coordinator is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
