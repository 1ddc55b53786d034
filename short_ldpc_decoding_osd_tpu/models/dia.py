"""DIA (decoding-information-aggregation) reliability refiners + stopper.

flax re-implementations of the reference's tiny Keras models:

* ``ConvBitwise`` — per-bit 1-D CNN over the (T+1)-step LLR trajectory:
  Conv1D(8,k3,valid) -> Conv1D(4,k3) -> Conv1D(2,k3) -> flatten -> Dense(1),
  all linear, reshaped to [B, n] (``DL_Training_serial/nn_net.py:173-207``).
* ``RnnOne`` — GRU(n) -> GRU(n) -> Dense(n) over the [B, T+1, n] sequence,
  linear candidate activations, sigmoid gates, no biases
  (``nn_net.py:386-418``).
* ``RnnTwo`` — SimpleRNN(n) x2 -> Dense(n), linear (``nn_net.py:420-453``).
* ``StopperFcn`` — Dense(win+1, linear, no bias, L2) -> Dense(2, softmax,
  no bias) (``nn_net.py:136-148``).

The models train in-framework; architecture parity (not weight parity) is
what matters, so gate conventions follow the standard GRU update
h' = z*h + (1-z)*cand with the reset gate applied after the hidden matmul.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBitwise(nn.Module):
    """Per-bit CNN over iteration trajectories."""

    n: int
    list_length: int  # T+1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B*n, T+1, 1)
        x = nn.Conv(8, (3,), padding="VALID", use_bias=False, name="conv1")(x)
        x = nn.Conv(4, (3,), padding="VALID", use_bias=False, name="conv2")(x)
        x = nn.Conv(2, (3,), padding="VALID", use_bias=False, name="conv3")(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(1, name="head")(x)
        return x.reshape((-1, self.n))

    def refine(self, params, trajectories: jnp.ndarray) -> jnp.ndarray:
        """(B, T+1, n) trajectories -> (B, n) refined reliabilities."""
        batch = trajectories.shape[0]
        per_bit = jnp.transpose(trajectories, (0, 2, 1)).reshape(
            (batch * self.n, self.list_length, 1)
        )
        return self.apply(params, per_bit)

    def effective_filter(self, params):
        """Compose the (fully linear) conv stack into one (T+1,) tap vector
        plus a scalar bias.

        The reference CNN (``nn_net.py:173-207``) has no activations, so the
        conv1->conv2->conv3->dense chain is a single linear map from the
        trajectory to the refined scalar.  Obtained exactly by pushing the
        T+1 basis trajectories (and the zero trajectory, for the head bias)
        through ``apply`` — 14 rows of work at trace time."""
        t = self.list_length
        rows = -(-(t + 1) // self.n) * self.n  # pad: __call__ reshapes to (-1, n)
        basis = jnp.concatenate(
            [jnp.eye(t, dtype=jnp.float32), jnp.zeros((rows - t, t), jnp.float32)]
        )[:, :, None]  # (rows, T+1, 1); row t is the zero trajectory
        out = self.apply(params, basis).reshape(-1)
        bias = out[t]
        taps = out[:t] - bias
        return taps, bias

    def refine_fast(self, params, trajectories: jnp.ndarray) -> jnp.ndarray:
        """Inference-only refine via the composed linear filter: one
        contraction over the iteration axis instead of three tiny-channel
        convolutions (identical map; float association differs)."""
        taps, bias = self.effective_filter(params)
        # full-f32 contraction: the default TPU matmul truncates operands to
        # bf16 (~1e-3 relative error on the refined metric, enough to flip
        # reliability ranks near ties)
        return (
            jnp.einsum(
                "btn,t->bn", trajectories, taps,
                precision=jax.lax.Precision.HIGHEST,
            )
            + bias
        )


class _LinearGRU(nn.Module):
    """GRU with linear candidate activation and no biases."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        d = x.shape[-1]
        init = nn.initializers.glorot_uniform()
        wi = self.param("wi", init, (d, 3 * self.features))
        wh = self.param("wh", nn.initializers.orthogonal(), (self.features, 3 * self.features))

        def step(h, xt):
            gi = xt @ wi
            gh = h @ wh
            iz, ir, ic = jnp.split(gi, 3, axis=-1)
            hz, hr, hc = jnp.split(gh, 3, axis=-1)
            z = jax.nn.sigmoid(iz + hz)
            r = jax.nn.sigmoid(ir + hr)
            cand = ic + r * hc  # linear activation
            h_new = z * h + (1.0 - z) * cand
            return h_new, h_new

        h0 = jnp.zeros((x.shape[0], self.features), x.dtype)
        _, seq = jax.lax.scan(step, h0, jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(seq, 0, 1)  # (B, T, features)


class _LinearSimpleRNN(nn.Module):
    """SimpleRNN with linear activation and no biases."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        d = x.shape[-1]
        wi = self.param("wi", nn.initializers.glorot_uniform(), (d, self.features))
        wh = self.param("wh", nn.initializers.orthogonal(), (self.features, self.features))

        def step(h, xt):
            h_new = xt @ wi + h @ wh
            return h_new, h_new

        h0 = jnp.zeros((x.shape[0], self.features), x.dtype)
        _, seq = jax.lax.scan(step, h0, jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(seq, 0, 1)


class RnnOne(nn.Module):
    """GRU x2 over the iteration sequence."""

    n: int
    list_length: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T+1, n)
        x = _LinearGRU(self.n, name="gru1")(x)
        x = _LinearGRU(self.n, name="gru2")(x)[:, -1]
        return nn.Dense(self.n, use_bias=False, name="head")(x)

    def refine(self, params, trajectories: jnp.ndarray) -> jnp.ndarray:
        return self.apply(params, trajectories)

    refine_fast = refine


class RnnTwo(nn.Module):
    """SimpleRNN x2 over the iteration sequence."""

    n: int
    list_length: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _LinearSimpleRNN(self.n, name="rnn1")(x)
        x = _LinearSimpleRNN(self.n, name="rnn2")(x)[:, -1]
        return nn.Dense(self.n, use_bias=False, name="head")(x)

    def refine(self, params, trajectories: jnp.ndarray) -> jnp.ndarray:
        return self.apply(params, trajectories)

    refine_fast = refine


class StopperFcn(nn.Module):
    """Sliding-window early-termination classifier."""

    input_width: int  # window + 1 (sorted minima + position index)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.input_width, use_bias=False, name="dense1")(x)
        return jax.nn.softmax(nn.Dense(2, use_bias=False, name="dense2")(x), axis=-1)


DIA_MODELS = {"model_cnn": ConvBitwise, "model_rnn1": RnnOne, "model_rnn2": RnnTwo}

# The reference switches DIA architectures with CNN/RNN1/RNN2 booleans
# (``DL_Training_serial/Main_DL.py:22-24``) but names the checkpoint prefixes
# model_cnn/model_rnn1/model_rnn2; this CLI historically advertised
# rnn_one/rnn_two (the nn_net.py builder-function names).  Accept every
# spelling — an unknown name must raise a helpful error, not a bare KeyError
# minutes into a sweep.
DIA_ALIASES = {
    "cnn": "model_cnn",
    "rnn_one": "model_rnn1",
    "rnn_two": "model_rnn2",
    "rnn1": "model_rnn1",
    "rnn2": "model_rnn2",
}


def canonical_dia_name(kind: str) -> str:
    """Resolve a DIA model name (or alias) to its registry key."""
    name = DIA_ALIASES.get(kind, kind)
    if name not in DIA_MODELS:
        raise ValueError(
            f"unknown DIA model {kind!r}; expected one of "
            f"{sorted(DIA_MODELS) + sorted(DIA_ALIASES)}"
        )
    return name


def make_dia(kind: str, n: int, list_length: int):
    """Construct a DIA model by reference prefix name (aliases accepted)."""
    kind = canonical_dia_name(kind)
    if kind == "model_cnn" and list_length < 7:
        # three valid-padding k=3 convs consume 6 steps (nn_net.py:190-196)
        raise ValueError(
            f"model_cnn needs list_length (BP iterations + 1) >= 7, got "
            f"{list_length}; use >= 6 decoding iterations or an RNN refiner"
        )
    return DIA_MODELS[kind](n=n, list_length=list_length)


def stopper_engine_params(params) -> dict:
    """Extract the plain {w1, w2} dict the OSD engine consumes from a flax
    StopperFcn variable collection."""
    inner = params["params"]
    return {"w1": inner["dense1"]["kernel"], "w2": inner["dense2"]["kernel"]}


def dia_loss(refined: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid CE with logits = -refined (``nn_training.py:293-297``)."""
    logits = -refined
    z = labels.astype(logits.dtype)
    return jnp.sum(
        jnp.maximum(logits, 0.0) - logits * z + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
