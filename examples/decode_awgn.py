#!/usr/bin/env python
"""Example: batched soft-decision decode over an AWGN channel.

Encodes a batch of random frames with the K=7 rate-1/2 code, passes them
through a 3 dB Eb/N0 channel, decodes on whatever accelerator JAX sees, and
prints the coded BER."""

import jax
import jax.numpy as jnp
import numpy as np

from ka9q_viterbi_comparison_tpu import VITERBI27, soft16_spec
from ka9q_viterbi_comparison_tpu.models.functional import decode_symbols
from ka9q_viterbi_comparison_tpu.ops.channel import awgn_symbols
from ka9q_viterbi_comparison_tpu.utils.bits import bit_error_rate


def main() -> None:
    code, numeric = VITERBI27, soft16_spec(2)
    batch, frame_bytes, ebn0_db = 64, 256, 3.0

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(batch, frame_bytes), dtype=np.uint8)

    symbols = awgn_symbols(code, numeric, jax.random.key(0), jnp.asarray(data), ebn0_db)
    decoded = decode_symbols(code, numeric, symbols, frame_bytes * 8)

    ber = bit_error_rate(np.asarray(decoded), data)
    print(f"{code.name} @ {ebn0_db} dB Eb/N0: "
          f"{batch * frame_bytes * 8} bits, coded BER = {ber:.2e}")


if __name__ == "__main__":
    main()
