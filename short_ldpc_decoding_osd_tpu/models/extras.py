"""Experimental model variants present (but unused) in the reference.

The reference's ``DL_Training_serial/nn_net.py`` ships several architectures
that its live pipeline never instantiates; they document the design space the
authors explored.  For inventory parity (SURVEY.md §2, stage-3 "unused but
present" row) this module provides flax equivalents, each usable as a DIA
refiner or stopper drop-in:

* ``SelfAttention`` / ``MultiHeadAttention`` / ``TransformerLayer``
  (``nn_net.py:17-80``) — a standard pre-LN-free transformer block with
  per-head Q/K/V projections and a post-attention residual + LayerNorm.
* ``TemperatureLayer`` (``nn_net.py:83-94``) — trainable scalar multiplier.
* ``PredictOutlier`` (``nn_net.py:96-134``) — the heavier 3-layer stopper
  (2w ReLU -> w ReLU -> temperature -> softmax(2), L2-regularized, no bias);
  the live pipeline uses the "light" one (``models.dia.StopperFcn``).
* ``PredictPhase0/1/2/3`` (``nn_net.py:234-384``) — multi-class *phase*
  predictors mapping the full (2L-1)-feature block-minima profile straight
  to a decoding-path phase distribution, with fixed softmax temperatures
  5/10/100/1 — the design the sliding-window walk replaced.
* ``RnnThree`` (+ its ``ModelRnn2nd`` reducer, ``nn_net.py:455-530``) —
  per-variable LSTM over check-neighborhood trajectories with learned
  per-iteration mixing coefficients, reduced by a second LSTM.
* ``CnvNn`` (``nn_net.py:532-600``) — 2-D conv stack over per-variable
  neighborhood maps (kernel height 3 or 5 by check degree, stride matching).

These are *architecture* ports; none carries trained reference weights (the
reference has none for them either — they are dead code there).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SelfAttention(nn.Module):
    """Single-head scaled dot-product self-attention (``nn_net.py:61-80``)."""

    units: int
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        q = nn.Dense(self.units, name="wq")(x)
        k = nn.Dense(self.units, name="wk")(x)
        v = nn.Dense(self.units, name="wv")(x)
        scores = q @ jnp.swapaxes(k, -1, -2) / jnp.sqrt(jnp.float32(self.units))
        w = jax.nn.softmax(scores, axis=-1)
        w = nn.Dropout(self.dropout_rate, deterministic=deterministic)(w)
        return w @ v


class MultiHeadAttention(nn.Module):
    """Concat of ``num_heads`` SelfAttention heads of width units/num_heads,
    followed by an output projection (``nn_net.py:40-59``)."""

    units: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        depth = self.units // self.num_heads
        heads = [
            SelfAttention(depth, name=f"head{i}")(x, deterministic)
            for i in range(self.num_heads)
        ]
        return nn.Dense(self.units, name="out")(jnp.concatenate(heads, axis=-1))


class TransformerLayer(nn.Module):
    """Post-LN transformer block: MHA + residual + LN, FFN + residual + LN
    (``nn_net.py:17-38``)."""

    units: int
    num_heads: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        a = MultiHeadAttention(self.units, self.num_heads, name="mha")(
            x, deterministic
        )
        a = nn.Dropout(self.dropout_rate, deterministic=deterministic)(a)
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x + a)
        f = nn.Dense(self.units, name="ffn1")(x)
        f = nn.relu(f)
        f = nn.Dropout(self.dropout_rate, deterministic=deterministic)(f)
        f = nn.Dense(self.units, name="ffn2")(f)
        return nn.LayerNorm(epsilon=1e-6, name="norm2")(x + f)


class TemperatureLayer(nn.Module):
    """Trainable scalar multiplier, init 1.0 (``nn_net.py:83-94``)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        t = self.param("temperature", nn.initializers.ones, (1,))
        return x * t


class PredictOutlier(nn.Module):
    """Heavier 3-layer stopper with trainable temperature
    (``nn_net.py:96-134``); the live pipeline uses ``dia.StopperFcn``."""

    input_width: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(2 * self.input_width, use_bias=False, name="dense1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.input_width, use_bias=False, name="dense2")(x)
        x = nn.relu(x)
        x = TemperatureLayer(name="temperature")(x)
        return jax.nn.softmax(nn.Dense(2, use_bias=False, name="out")(x), axis=-1)


def predict_outlier_l2(params, weight: float = 0.01) -> jnp.ndarray:
    """L2 penalty on the two hidden kernels (Keras ``regularizers.l2(0.01)``)."""
    inner = params["params"]
    return weight * (
        jnp.sum(inner["dense1"]["kernel"] ** 2)
        + jnp.sum(inner["dense2"]["kernel"] ** 2)
    )


class PredictPhase(nn.Module):
    """Multi-class phase predictor family (``nn_net.py:234-384``).

    Maps the (2*decoding_length - 1)-feature profile to a distribution over
    ``capacity`` phases.  ``version`` selects the reference variant:
      0: 2c linear -> c linear, /5, softmax
      1: c linear -> Dense(c) softmax head, /10
      2: 4c linear -> c linear, /100, softmax
      3: 4 -> 2 -> softmax(c), no temperature
    """

    decoding_length: int
    capacity: int
    version: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.capacity
        if self.version == 0:
            x = nn.Dense(2 * c, use_bias=False, name="dense1")(x)
            x = nn.Dense(c, use_bias=False, name="dense2")(x) / 5.0
            return jax.nn.softmax(x, axis=-1)
        if self.version == 1:
            x = nn.Dense(c, use_bias=False, name="dense1")(x)
            return jax.nn.softmax(nn.Dense(c, name="head")(x / 10.0), axis=-1)
        if self.version == 2:
            x = nn.Dense(4 * c, use_bias=False, name="dense1")(x)
            x = nn.Dense(c, use_bias=False, name="dense2")(x) / 100.0
            return jax.nn.softmax(x, axis=-1)
        if self.version == 3:
            x = nn.Dense(4, name="dense1")(x)
            x = nn.Dense(2, name="dense2")(x)
            return jax.nn.softmax(nn.Dense(c, name="head")(x), axis=-1)
        raise ValueError(f"unknown PredictPhase version {self.version}")


def neighborhood_trajectories(h: np.ndarray, trajectories: jnp.ndarray):
    """Per-variable check-neighborhood views of an iteration trajectory.

    The reference builds, for each variable i, the values its adjacent
    checks see across iterations (``rnn_three.preprocessing_inputs``,
    ``nn_net.py:489-512``): the i-th column's value first, then the other
    ``row_weight - 1`` members of each adjacent row.  Returns a
    (B, n, dv_max, T+1, dc) tensor (zero-padded on irregular degrees) built
    with static gathers — no Python-per-frame loops.
    """
    h = np.asarray(h)
    m, n = h.shape
    dc = int(h.sum(axis=1).max())
    dv = int(h.sum(axis=0).max())
    # per (variable, adjacent-row slot): column gather order with the
    # variable's own column first, then the row's other members (the
    # reference's concat([selected_col, part1, part2]) ordering)
    order = np.zeros((n, dv, dc), np.int64)
    mask = np.zeros((n, dv, dc), np.float32)
    for v in range(n):
        rows = np.nonzero(h[:, v])[0]
        for slot, r in enumerate(rows[:dv]):
            cols = [v] + [c for c in np.nonzero(h[r])[0] if c != v]
            order[v, slot, : len(cols)] = cols
            mask[v, slot, : len(cols)] = 1.0
    traj = jnp.asarray(trajectories)  # (B, T+1, n)
    # (B, T+1, n, dv, dc) static gather, then mask the padding
    per_var = traj[:, :, order] * jnp.asarray(mask)[None, None]
    # (B, n, dv, T+1, dc)
    return jnp.transpose(per_var, (0, 2, 3, 1, 4))


class ModelRnn2nd(nn.Module):
    """Second-stage LSTM reducer (``nn_net.py:514-530``)."""

    list_length: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, n, T+1) per-variable reduced sequences
        batch, n, ll = x.shape
        seq = x.reshape((batch * n, ll, 1))
        out = nn.RNN(nn.OptimizedLSTMCell(self.list_length), name="lstm")(seq)[:, -1]
        out = nn.Dense(1, name="head")(out)
        return out.reshape((batch, n))


class RnnThree(nn.Module):
    """Neighborhood-LSTM DIA variant (``nn_net.py:455-512``): an LSTM over
    each adjacent check's other-member trajectory, mixed with the variable's
    own trajectory by learned per-iteration coefficients, mean-reduced over
    the variable's checks, then reduced by ``ModelRnn2nd``."""

    n: int
    list_length: int

    @nn.compact
    def __call__(self, neigh: jnp.ndarray) -> jnp.ndarray:
        # neigh: (B, n, dv, T+1, dc) from neighborhood_trajectories
        batch, n, dv, ll, dc = neigh.shape
        own = neigh[..., 0]  # (B, n, dv, T+1): the variable's own value
        others = neigh[..., 1:]  # (B, n, dv, T+1, dc-1)
        coeff = self.param(
            "coefficients", nn.initializers.zeros, (ll,)
        )
        seq = others.reshape((batch * n * dv, ll, dc - 1))
        x = nn.RNN(nn.OptimizedLSTMCell(7), name="lstm")(seq)
        x = nn.Dense(1, name="head")(x)[..., 0]  # (B*n*dv, T+1)
        x = x.reshape((batch, n, dv, ll))
        mixed = own + coeff[None, None, None, :] * x
        reduced = jnp.mean(mixed, axis=2)  # (B, n, T+1)
        return ModelRnn2nd(self.list_length, name="rnn_2nd")(reduced)

    def refine(self, params, h: np.ndarray, trajectories: jnp.ndarray):
        return self.apply(params, neighborhood_trajectories(h, trajectories))


class CnvNn(nn.Module):
    """2-D conv stack over per-variable neighborhood maps
    (``nn_net.py:532-600``): kernel height 3 (or 5) by check degree with
    matching stride, then 4 more [3,1] conv stages down to one scalar per
    variable."""

    n: int
    list_length: int

    @nn.compact
    def __call__(self, neigh: jnp.ndarray) -> jnp.ndarray:
        # neigh: (B, n, dv, T+1, dc) -> rows = dv*(T+1) stacked neighborhoods
        batch, n, dv, ll, dc = neigh.shape
        x = neigh.reshape((batch * n, dv * ll, dc, 1))
        stride = dv if dv in (3, 5) else 3
        x = nn.Conv(32, (stride, dc), strides=(stride, 1), padding="VALID",
                    name="conv1")(x)
        x = nn.elu(x)
        # SAME padding on the reduction stages (reference uses VALID, which
        # only admits its fixed T+1=13; SAME keeps the stack shape-robust)
        for i, feats in enumerate((64, 32, 8)):
            x = nn.Conv(feats, (3, 1), padding="SAME", name=f"conv{i + 2}")(x)
            x = nn.elu(x)
        x = nn.Conv(1, (3, 1), padding="SAME", name="conv5")(x)
        x = jnp.mean(x.reshape((batch * n, -1)), axis=-1)
        return x.reshape((batch, n))

    def refine(self, params, h: np.ndarray, trajectories: jnp.ndarray):
        return self.apply(params, neighborhood_trajectories(h, trajectories))
