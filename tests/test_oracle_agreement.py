"""Cross-implementation agreement vs the NumPy scalar oracle.

The reference's test strategy runs independent decoder implementations over
the same stream as oracles for each other (SURVEY §4).  Here: jnp path vs the
step-at-a-time NumPy oracle must agree bit-for-bit on noisy (not just
noiseless) symbols, which exercises identical tie-breaking and metric
arithmetic, not just ML-path recovery.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ka9q_viterbi_comparison_tpu import (
    VITERBI27,
    VITERBI29,
    VITERBI615,
    ViterbiDecoder,
    soft8_spec,
    ka9q_offset_binary_spec,
)
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops.oracle import oracle_decode, oracle_encode


@pytest.mark.parametrize("code,n_bytes", [(VITERBI27, 32), (VITERBI29, 16), (VITERBI615, 4)],
                         ids=lambda x: getattr(x, "name", x))
def test_oracle_encoder_matches_jax_encoder(code, n_bytes, rng):
    numeric = soft8_spec(code.R)
    data = rng.integers(0, 256, size=(n_bytes,), dtype=np.uint8)
    ref = oracle_encode(code, numeric, data)
    got = np.asarray(encode_frames(code, numeric, jnp.asarray(data[None, :])))[0]
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("code,n_bytes", [(VITERBI27, 32), (VITERBI29, 16)],
                         ids=lambda x: getattr(x, "name", x))
def test_noisy_decode_agrees_with_oracle(code, n_bytes, rng):
    """Same quantised noisy symbols -> bit-identical decode + path metric."""
    numeric = ka9q_offset_binary_spec()
    data = rng.integers(0, 256, size=(n_bytes,), dtype=np.uint8)
    clean = oracle_encode(code, numeric, data).astype(np.float64)
    # Offset-binary AWGN-ish corruption, quantised back to 0..255.
    noisy = clean + rng.normal(0.0, 40.0, size=clean.shape)
    noisy = np.clip(np.round(noisy), 0, 255).astype(np.int32)

    ref_bytes, ref_pm = oracle_decode(code, numeric, noisy, n_bytes * 8)

    dec = ViterbiDecoder(code, numeric, batch=1)
    dec.update(jnp.asarray(noisy[None, :]))
    got_bytes = np.asarray(dec.chainback(n_bytes * 8))[0]
    got_pm = int(np.asarray(dec.path_metric())[0])

    np.testing.assert_array_equal(got_bytes, ref_bytes)
    assert got_pm == ref_pm
