"""Bit packing / unpacking and bit-error counting.

TPU-native replacement for the reference's table-driven scalar bit utilities
(ref: src/bitcount.h:32-51, src/parity.h:37-55): everything here is a
vectorised jnp expression so it fuses into surrounding XLA programs instead of
walking bytes through a 256-entry LUT.

Byte/bit order is MSB-first, matching the order the reference encoder consumes
input bytes and its chainback emits decoded bytes
(ref: ka9q_libfec_port/viterbi27_sse2.cpp:97-103).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "bytes_to_bits",
    "bits_to_bytes",
    "pack_bits_to_words",
    "count_bit_errors",
    "bit_error_rate",
]


def bytes_to_bits(data: jnp.ndarray) -> jnp.ndarray:
    """Unpack uint8 ``[..., N]`` to bits ``[..., 8N]`` MSB-first, dtype uint8."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB first
    bits = (data[..., :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def bits_to_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """Pack bits ``[..., 8N]`` (MSB-first) into uint8 ``[..., N]``."""
    n = bits.shape[-1]
    if n % 8 != 0:
        raise ValueError(f"bit count {n} not a multiple of 8")
    b = bits.reshape(*bits.shape[:-1], n // 8, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8))
    return (b * weights).sum(axis=-1, dtype=jnp.uint32).astype(jnp.uint8)


def pack_bits_to_words(bits: jnp.ndarray) -> jnp.ndarray:
    """Pack bits ``[..., 32*W]`` into uint32 words ``[..., W]``, bit ``i`` of a
    word holding bit ``32*w + i`` (LSB-first within a word).

    This is the decision-word layout: bit ``s % 32`` of word ``s // 32`` is the
    decision for trellis state ``s``, the same state-indexed packing as the
    reference's decision unions (ref: ka9q_libfec_port/viterbi615_sse2.cpp:13,
    chainback lookup :86).
    """
    n = bits.shape[-1]
    if n % 32 != 0:
        raise ValueError(f"bit count {n} not a multiple of 32")
    b = bits.reshape(*bits.shape[:-1], n // 32, 32).astype(jnp.uint32)
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    return (b * weights).sum(axis=-1, dtype=jnp.uint32)


def count_bit_errors(a, b) -> int:
    """Total differing bits between two equal-shaped uint8 arrays
    (ref: src/util.h:64-73)."""
    xor = np.bitwise_xor(np.asarray(a, dtype=np.uint8), np.asarray(b, dtype=np.uint8))
    return int(np.unpackbits(xor).sum())


def bit_error_rate(a, b) -> float:
    total_bits = int(np.asarray(a).size) * 8
    return count_bit_errors(a, b) / float(total_bits)
