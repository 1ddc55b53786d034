"""Channel sampling: BPSK over AWGN (optionally Rayleigh block fading).

On-device ``jax.random`` generation so the Monte-Carlo harness never touches
the host.  Semantics follow the reference:

* LLR proxy is the *raw channel sample* (no 2y/sigma^2 scaling) with mean +1
  for bit 0 and -1 for bit 1 — ``Training_data_gen_128/data_generating.py:69-77``
  and the commented-out scaling at ``Testing_data_gen_128/data_generating.py:48-50``.
  Learned normalization factors depend on this convention, so it is kept.
* Training supports an SNR-range importance blend: when ``snr_lo != snr_hi``
  the effective (mean, sigma) come from moments of the density
  ``f_w(x) = exp(-|x - sigma_mid|)`` over ``[sigma(snr_lo), sigma(snr_hi)]``
  (``data_generating.py:15-24,56-70``).
* Testing uses a fixed sigma per SNR point, optional Rayleigh fading with a
  block-duration parameter (``Testing_data_gen_128/data_generating.py:21-38``).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy import integrate


def sigma_for_snr(snr_db: float, rate: float) -> float:
    """AWGN noise sigma for Eb/N0 ``snr_db`` at code rate ``rate``."""
    return math.sqrt(1.0 / (2.0 * rate * 10.0 ** (snr_db / 10.0)))


def blend_moments(snr_lo: float, snr_hi: float, rate: float) -> tuple[float, float]:
    """(mean, sigma) of the SNR-blend importance density.

    Degenerates to (1, sigma(snr)) when the endpoints coincide.  Host-side
    scipy quadrature, evaluated once at trace time.
    """
    s1 = sigma_for_snr(snr_lo, rate)
    s2 = sigma_for_snr(snr_hi, rate)
    if snr_lo == snr_hi:
        return 1.0, s1
    mid = sigma_for_snr((snr_lo + snr_hi) / 2.0, rate)

    def f_w(x):
        return math.exp(-abs(x - mid))

    def f1(x):
        return 2.0 / (x**2) * f_w(x)

    def f2(x):
        return 4.0 * (1.0 / x**2 + 1.0 / x**4) * f_w(x)

    norm, _ = integrate.quad(f_w, s1, s2)
    mean = integrate.quad(f1, s1, s2)[0] / norm
    second = integrate.quad(f2, s1, s2)[0] / norm
    var = second - mean**2
    return mean, math.sqrt(var)


@dataclasses.dataclass(frozen=True)
class ChannelSpec:
    """Static channel description baked into the jitted sampler."""

    mean: float
    sigma: float
    rayleigh: bool = False
    fading_block: int = 16  # samples per constant-fading block

    @classmethod
    def awgn(cls, snr_db: float, rate: float) -> "ChannelSpec":
        return cls(mean=1.0, sigma=sigma_for_snr(snr_db, rate))

    @classmethod
    def blend(cls, snr_lo: float, snr_hi: float, rate: float) -> "ChannelSpec":
        mean, sigma = blend_moments(snr_lo, snr_hi, rate)
        return cls(mean=mean, sigma=sigma)

    @classmethod
    def rayleigh_spec(
        cls, snr_db: float, rate: float, duration: float = 1.0
    ) -> "ChannelSpec":
        # reference block structure: f_sample=1024, carrier 64 Hz ->
        # 16 samples/period; fading constant over 16*duration samples
        return cls(
            mean=1.0,
            sigma=sigma_for_snr(snr_db, rate),
            rayleigh=True,
            fading_block=int(16 * duration),
        )


def sample_batch(
    key: jax.Array,
    spec: ChannelSpec,
    generator: jax.Array,
    batch: int,
    all_zeros: bool = False,
):
    """Draw a batch of (llr_proxy, codeword) pairs fully on device.

    Args:
      key: PRNG key.
      spec: channel description (static).
      generator: (k, n) generator matrix as a float array.
      batch: number of frames.
      all_zeros: transmit the all-zeros codeword (reference's
        ALL_ZEROS_CODEWORD_* switch).

    Returns:
      llr: (batch, n) float32 channel samples, positive ~ bit 0.
      codewords: (batch, n) int32 transmitted bits.
    """
    k, n = generator.shape
    k_msg, k_noise, k_fade = jax.random.split(key, 3)
    noise = jax.random.normal(k_noise, (batch, n), dtype=jnp.float32)
    if spec.rayleigh:
        total = batch * n
        nblocks = -(-total // spec.fading_block)
        iq = jax.random.normal(k_fade, (2, nblocks), dtype=jnp.float32)
        mag = jnp.sqrt((iq[0] ** 2 + iq[1] ** 2) / 2.0)
        gain = jnp.repeat(mag, spec.fading_block)[:total].reshape(batch, n)
    else:
        gain = spec.mean
    received = gain + noise * spec.sigma
    if all_zeros:
        codewords = jnp.zeros((batch, n), dtype=jnp.int32)
        return received, codewords
    messages = jax.random.bernoulli(k_msg, 0.5, (batch, k)).astype(jnp.float32)
    # GF(2) encode on the MXU: integer-valued f32 matmul then parity
    prods = messages @ generator.astype(jnp.float32)
    codewords = (prods - 2.0 * jnp.floor(prods * 0.5)).astype(jnp.int32)
    llr = jnp.where(codewords == 0, received, -received)
    return llr, codewords
