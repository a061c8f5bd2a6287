"""Fuzz: the generic implementation must round-trip arbitrary (K, R, poly)
codes, not just the six benchmark configs."""

import jax.numpy as jnp
import numpy as np
import pytest

from ka9q_viterbi_comparison_tpu import CodeSpec, soft8_spec
from ka9q_viterbi_comparison_tpu.models.functional import decode_symbols
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops.oracle import oracle_decode, oracle_encode
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors


def random_code(rng, K, R):
    # Non-degenerate polynomials: always tap the newest bit and the oldest
    # (ensures full constraint length and invertibility in practice).
    top = 1 << (K - 1)
    polys = []
    while len(polys) < R:
        p = int(rng.integers(0, 1 << K)) | 1 | top
        polys.append(p if rng.integers(2) else -p)
    return CodeSpec(f"fuzz_k{K}r{R}", K=K, R=R, polys=tuple(polys))


@pytest.mark.parametrize("K,R", [(3, 2), (5, 3), (8, 2), (11, 2), (6, 4)])
def test_random_code_roundtrip(K, R, rng):
    code = random_code(rng, K, R)
    numeric = soft8_spec(R)
    n_bytes = 16
    data = rng.integers(0, 256, size=(2, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    out = decode_symbols(code, numeric, syms, n_bytes * 8)
    assert count_bit_errors(np.asarray(out), data) == 0


def test_random_code_oracle_agreement(rng):
    code = random_code(rng, 7, 3)
    numeric = soft8_spec(3)
    data = rng.integers(0, 256, size=8, dtype=np.uint8)
    syms = oracle_encode(code, numeric, data)
    noisy = syms + rng.integers(-2, 3, size=syms.shape)
    out_o, pm_o = oracle_decode(code, numeric, noisy, 64)
    out_j = np.asarray(
        decode_symbols(code, numeric, jnp.asarray(noisy)[None], 64)
    )[0]
    np.testing.assert_array_equal(out_j, out_o)
