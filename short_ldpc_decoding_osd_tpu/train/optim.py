"""Shared optax building blocks mirroring the reference's optimizer setup."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def clip_each_by_norm(max_norm: float) -> optax.GradientTransformation:
    """Per-tensor norm clipping, the analogue of looping ``tf.clip_by_norm``
    over gradients (``ms_decoder_dense.py:321``)."""

    def init(_):
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.where(norm > max_norm, max_norm / (norm + 1e-30), 1.0)
            return g * scale

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init, update)


def staircase_adam(
    initial_lr: float, decay_steps: int, decay_rate: float, clip_norm: float
) -> optax.GradientTransformation:
    """Adam with staircase exponential lr decay + per-tensor clipping.

    Mirrors ``globalmap.py:99-105`` (training stages use
    ``ExponentialDecay(staircase=True)`` and clip norms 5 or 5e2)."""
    schedule = optax.exponential_decay(
        init_value=initial_lr,
        transition_steps=decay_steps,
        decay_rate=decay_rate,
        staircase=True,
    )
    return optax.chain(clip_each_by_norm(clip_norm), optax.adam(schedule))
