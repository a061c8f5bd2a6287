"""Native (C++) host decoder: build, round-trip, and cross-oracle agreement
with both the NumPy oracle and the JAX path."""

import jax.numpy as jnp
import numpy as np
import pytest

from ka9q_viterbi_comparison_tpu import (
    STANDARD_CODES,
    VITERBI27,
    VITERBI615,
    soft8_spec,
)
from ka9q_viterbi_comparison_tpu.models.functional import decode_symbols
from ka9q_viterbi_comparison_tpu.ops.oracle import oracle_decode, oracle_encode
from ka9q_viterbi_comparison_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")

SMALL_BYTES = {"viterbi27": 64, "viterbi47": 64, "viterbi29": 32,
               "viterbi49": 32, "viterbi615": 8, "viterbi224": 2}


@pytest.mark.parametrize("code", STANDARD_CODES, ids=lambda c: c.name)
def test_native_roundtrip(code, rng):
    numeric = soft8_spec(code.R)
    n = SMALL_BYTES[code.name]
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    syms = native.encode(code, numeric, data)
    out, pm = native.decode(code, numeric, syms, n)
    np.testing.assert_array_equal(out, data)
    assert pm == 0  # noiseless channel: survivor has zero error


def test_native_agrees_with_numpy_oracle(rng):
    code, numeric = VITERBI27, soft8_spec(2)
    data = rng.integers(0, 256, size=32, dtype=np.uint8)
    syms_native = native.encode(code, numeric, data)
    syms_oracle = oracle_encode(code, numeric, data)
    np.testing.assert_array_equal(syms_native, syms_oracle)
    out_o, pm_o = oracle_decode(code, numeric, syms_oracle, 32 * 8)
    out_n, pm_n = native.decode(code, numeric, syms_native, 32)
    np.testing.assert_array_equal(out_n, out_o)
    assert pm_n == pm_o


def test_native_decodes_noisy_jax_stream(rng):
    """Feed the same noisy symbols to the native and JAX decoders; the
    decoded bytes must agree bit-for-bit (identical tie-break contract)."""
    import jax

    from ka9q_viterbi_comparison_tpu.ops.channel import awgn_symbols

    code = VITERBI615
    from ka9q_viterbi_comparison_tpu import soft16_spec

    numeric = soft16_spec(code.R)
    data = rng.integers(0, 256, size=(1, 8), dtype=np.uint8)
    syms = awgn_symbols(code, numeric, jax.random.key(3), jnp.asarray(data), 1.0)
    out_jax = np.asarray(decode_symbols(code, numeric, syms, 8 * 8))[0]
    out_nat, _ = native.decode(code, numeric, np.asarray(syms)[0], 8)
    np.testing.assert_array_equal(out_nat, out_jax)


def test_native_bit_errors():
    a = np.array([0xFF, 0x00, 0xAA], dtype=np.uint8)
    b = np.array([0x0F, 0x00, 0x55], dtype=np.uint8)
    assert native.bit_errors(a, b) == 4 + 0 + 8
