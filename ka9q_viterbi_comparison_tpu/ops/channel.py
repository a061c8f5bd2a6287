"""Channel models and BER evaluation.

The reference has soft-decision machinery but never injects noise -- its
symbols are exact rail values and BER must be 0 (SURVEY §4; ref:
src/util.h:36, src/main.cpp:110-115).  A production decoder framework needs
the noisy half of the story, so this module adds an AWGN channel over the
rail mapping plus Eb/N0-parameterized vector generation, all batched jnp (the
TPU generates its own test vectors at full speed).

Conventions: a transmitted bit maps to +/- A where ``A = (high - low) / 2``
around the mid-rail, noise sigma follows from Eb/N0 with rate compensation
``Eb = Es * R_code^-1`` (R_code = 1/R, so Eb/N0 = Es/N0 * R), and received
values are clipped back to the rail range and rounded to the integer soft
alphabet the decoders consume.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import CodeSpec, NumericSpec
from .encoder import encode_bits
from ..utils.bits import bytes_to_bits

__all__ = ["awgn_symbols", "ebn0_sigma", "awgn_encode_frames"]


def ebn0_sigma(code: CodeSpec, ebn0_db: float) -> float:
    """Noise sigma for unit-amplitude antipodal symbols at a given Eb/N0 (dB).

    Es/N0 = Eb/N0 * (1/R); sigma^2 = 1 / (2 * Es/N0).
    """
    es_n0 = (10.0 ** (ebn0_db / 10.0)) / code.R
    return float((1.0 / (2.0 * es_n0)) ** 0.5)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def awgn_symbols(
    code: CodeSpec,
    numeric: NumericSpec,
    key: jax.Array,
    data_bytes: jnp.ndarray,
    ebn0_db: float,
) -> jnp.ndarray:
    """Encode ``[B, N]`` uint8 frames and pass them through an AWGN channel.

    Returns integer soft symbols ``[B, T*R]`` int32 in the numeric spec's
    rail range, quantized by rounding (the soft alphabet the reference's
    soft8/soft16 configs define, ref: src/viterbi_configs.h:22-50).
    """
    bits = bytes_to_bits(data_bytes)
    enc = encode_bits(code, bits)  # [B, T, R]
    B = enc.shape[0]
    high, low = numeric.soft_high, numeric.soft_low
    mid = (high + low) / 2.0
    amp = (high - low) / 2.0
    clean = jnp.where(enc.astype(jnp.bool_), 1.0, -1.0)
    sigma = ebn0_sigma(code, ebn0_db)
    noise = sigma * jax.random.normal(key, clean.shape, dtype=jnp.float32)
    rx = mid + amp * (clean + noise)
    rx = jnp.clip(jnp.round(rx), low, high).astype(jnp.int32)
    return rx.reshape(B, -1)


def awgn_encode_frames(code, numeric, key, data_bytes, ebn0_db):
    """Alias mirroring ``encode_frames``'s signature plus (key, ebn0_db)."""
    return awgn_symbols(code, numeric, key, data_bytes, ebn0_db)
