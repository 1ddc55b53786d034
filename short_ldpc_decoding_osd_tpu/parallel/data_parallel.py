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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..channel import ChannelSpec, sample_batch
from ..codes import Code
from ..ops import nms
from ..train.optim import staircase_adam


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
    h = jnp.asarray(code.h, jnp.float32)
    gen = jnp.asarray(code.g, jnp.float32)
    edge_cols = jnp.asarray(nms.edge_columns(code.h)) if variant == "NMS-r" else None

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
        outs = nms.decode(params, h, llr, num_iterations, variant, edge_cols)
        st = nms.frame_stats(outs[-1], words, h)
        return jnp.stack(
            [
                jnp.asarray(total_batch, jnp.int32),
                jnp.sum(st["frame_error"].astype(jnp.int32)),
                jnp.sum(st["bit_errors"].astype(jnp.int32)),
                jnp.sum(st["detected_failure"].astype(jnp.int32)),
                jnp.sum(st["undetected_error"].astype(jnp.int32)),
            ]
        )

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
    h = jnp.asarray(code.h, jnp.float32)
    gen = jnp.asarray(code.g, jnp.float32)
    edge_cols = jnp.asarray(nms.edge_columns(code.h)) if variant == "NMS-r" else None
    tx = staircase_adam(learning_rate, decay_steps, decay_rate, clip_norm)
    batch_sharding = _sharding(mesh, axis)
    replicated = _sharding(mesh)

    def loss_fn(params, llr, words):
        outs = nms.decode(params, h, llr, num_iterations, variant, edge_cols)
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
