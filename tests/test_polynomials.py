"""Polynomial conventions: inverted (negative) polynomials -- the SPIRAL
extension (ref: spiral/spiral27.cpp:69 `(poly[i] < 0) ^ parity(...)`) -- and
nonzero start states, across all implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from ka9q_viterbi_comparison_tpu import CodeSpec, soft8_spec
from ka9q_viterbi_comparison_tpu.models.functional import decode_symbols
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops.oracle import oracle_decode, oracle_encode
from ka9q_viterbi_comparison_tpu.utils import native
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors

# NASA-DSN convention K=7 code is usually specified with the second
# polynomial inverted.
INV_CODE = CodeSpec("k7_inverted", K=7, R=2, polys=(0o155, -0o117))


def test_inverted_poly_roundtrip(rng):
    numeric = soft8_spec(2)
    data = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
    syms = encode_frames(INV_CODE, numeric, jnp.asarray(data))
    out = decode_symbols(INV_CODE, numeric, syms, 64 * 8)
    assert count_bit_errors(np.asarray(out), data) == 0


def test_inverted_poly_changes_symbols(rng):
    """Sanity: the inversion must actually flip the second symbol stream."""
    numeric = soft8_spec(2)
    plain = CodeSpec("k7_plain", K=7, R=2, polys=(0o155, 0o117))
    data = rng.integers(0, 256, size=(1, 8), dtype=np.uint8)
    s_inv = np.asarray(encode_frames(INV_CODE, numeric, jnp.asarray(data))).reshape(-1, 2)
    s_pl = np.asarray(encode_frames(plain, numeric, jnp.asarray(data))).reshape(-1, 2)
    np.testing.assert_array_equal(s_inv[:, 0], s_pl[:, 0])
    assert (s_inv[:, 1] != s_pl[:, 1]).all()


def test_inverted_poly_all_oracles_agree(rng):
    numeric = soft8_spec(2)
    data = rng.integers(0, 256, size=16, dtype=np.uint8)
    syms = oracle_encode(INV_CODE, numeric, data)
    out_o, _ = oracle_decode(INV_CODE, numeric, syms, 16 * 8)
    np.testing.assert_array_equal(out_o, data)
    out_j = np.asarray(
        decode_symbols(INV_CODE, numeric, jnp.asarray(syms)[None, :], 16 * 8)
    )[0]
    np.testing.assert_array_equal(out_j, data)
    if native.available():
        np.testing.assert_array_equal(native.encode(INV_CODE, numeric, data), syms)
        out_n, _ = native.decode(INV_CODE, numeric, syms, 16)
        np.testing.assert_array_equal(out_n, data)


def test_bad_code_specs_rejected():
    with pytest.raises(ValueError):
        CodeSpec("bad", K=7, R=2, polys=(0o155,))  # wrong poly count
    with pytest.raises(ValueError):
        CodeSpec("bad", K=30, R=2, polys=(1, 1))  # K out of range
    with pytest.raises(ValueError):
        CodeSpec("bad", K=3, R=1, polys=(0o155,))  # poly wider than K
