"""Batched convolutional encoder.

TPU-native re-design of the reference's byte-at-a-time shift-register encoder
(``ConvolutionalEncoder_ShiftRegister::consume_byte`` driven by
``encode_data``, ref: src/util.h:14-62): instead of clocking one register,
the encoder is expressed as R small XOR-correlations over the whole bit
stream at once, so a full batch of frames encodes in a handful of fused VPU
ops.

Semantics preserved from the reference:

* input bytes are consumed MSB-first;
* output symbol order per trellis step is polynomial 0..R-1;
* K-1 zero tail bits terminate the trellis at state 0
  (ref: src/util.h:51-58);
* bits map to ``soft_high`` / ``soft_low`` rail values
  (ref: src/util.h:31-39).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import CodeSpec, NumericSpec
from ..utils.bits import bytes_to_bits

__all__ = ["encode_bits", "encode_frames", "encoded_symbol_count"]


def encoded_symbol_count(code: CodeSpec, data_bytes: int) -> int:
    return code.total_symbols(data_bytes)


@functools.partial(jax.jit, static_argnums=(0,))
def encode_bits(code: CodeSpec, data_bits: jnp.ndarray) -> jnp.ndarray:
    """Encode data bits ``[..., T_data]`` (0/1) into output bits
    ``[..., T, R]`` where ``T = T_data + K - 1`` includes the zero tail.

    Output bit ``[t, r] = parity(reg_t & poly[r]) ^ invert[r]`` with
    ``reg_t = (reg_{t-1} << 1) | b_t`` -- realised as an XOR of shifted bit
    streams: register bit ``j`` at time ``t`` is ``b_{t-j}``.
    """
    K, R = code.K, code.R
    tail = jnp.zeros((*data_bits.shape[:-1], K - 1), dtype=data_bits.dtype)
    bits = jnp.concatenate([data_bits, tail], axis=-1)
    T = bits.shape[-1]
    # b_{t-j} for j in 0..K-1 with zero history before t=0.
    padded = jnp.concatenate(
        [jnp.zeros((*bits.shape[:-1], K - 1), dtype=bits.dtype), bits], axis=-1
    )
    outs = []
    for p, inv in zip(code.abs_polys(), code.inversions()):
        acc = jnp.zeros_like(bits)
        for j in range(K):
            if (p >> j) & 1:
                acc = acc ^ jax.lax.slice_in_dim(padded, K - 1 - j, K - 1 - j + T, axis=-1)
        if inv:
            acc = acc ^ jnp.ones((), dtype=bits.dtype)
        outs.append(acc)
    return jnp.stack(outs, axis=-1)  # [..., T, R]


@functools.partial(jax.jit, static_argnums=(0, 1))
def encode_frames(
    code: CodeSpec, numeric: NumericSpec, data_bytes: jnp.ndarray
) -> jnp.ndarray:
    """Encode uint8 frames ``[..., N]`` into soft symbols ``[..., T*R]`` int32,
    bits mapped to the numeric spec's rail values.

    Equivalent of the reference's ``encode_data`` fixture path
    (ref: src/util.h:14-62) for a noiseless channel.
    """
    bits = bytes_to_bits(data_bytes)
    enc = encode_bits(code, bits)  # [..., T, R]
    syms = jnp.where(
        enc.astype(jnp.bool_),
        jnp.int32(numeric.soft_high),
        jnp.int32(numeric.soft_low),
    )
    return syms.reshape(*syms.shape[:-2], syms.shape[-2] * syms.shape[-1])
