"""Noiseless round-trip bit-exactness: the reference's core invariant.

Random bytes -> encode (exact rail symbols) -> decode -> compare.  Because the
channel is noiseless and the trellis is tail-terminated at state 0, any
nonzero BER is a bug (ref: src/main.cpp:110-115, src/util.h:51-58).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ka9q_viterbi_comparison_tpu import (
    STANDARD_CODES,
    VITERBI27,
    VITERBI224,
    ViterbiDecoder,
    decode_frames,
    hard8_spec,
    ka9q_offset_binary_spec,
    soft8_spec,
    soft16_spec,
)
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors

# Small frames keep CPU-emulated tests fast; full bench-size frames run on TPU.
TEST_FRAME_BYTES = {
    "viterbi27": 64,
    "viterbi47": 64,
    "viterbi29": 32,
    "viterbi49": 32,
    "viterbi615": 8,
    "viterbi224": 2,
}

SPECS = {
    "ka9q": lambda R: ka9q_offset_binary_spec(),
    "soft16": soft16_spec,
    "soft8": soft8_spec,
    "hard8": hard8_spec,
}


@pytest.mark.parametrize("code", STANDARD_CODES, ids=lambda c: c.name)
@pytest.mark.parametrize("spec_name", ["ka9q", "soft8"])
def test_noiseless_roundtrip(code, spec_name, rng):
    numeric = SPECS[spec_name](code.R)
    n_bytes = TEST_FRAME_BYTES[code.name]
    B = 3
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    out = decode_frames(code, numeric, syms, n_bytes * 8)
    assert count_bit_errors(np.asarray(out), data) == 0


@pytest.mark.parametrize("spec_name", ["soft16", "hard8"])
def test_noiseless_roundtrip_other_specs(spec_name, rng):
    code = VITERBI27
    numeric = SPECS[spec_name](code.R)
    data = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    out = decode_frames(code, numeric, syms, 64 * 8)
    assert count_bit_errors(np.asarray(out), data) == 0


def test_blockwise_update_matches_single_shot(rng):
    """update() must be resumable in blocks (ref: viterbi27_sse2.cpp:119)."""
    code = VITERBI27
    numeric = soft8_spec(code.R)
    data = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))

    dec = ViterbiDecoder(code, numeric, batch=2)
    split = 100 * code.R  # mid-frame, on a symbol-group boundary
    dec.update(syms[:, :split])
    dec.update(syms[:, split:])
    out = dec.chainback(64 * 8)
    assert count_bit_errors(np.asarray(out), data) == 0


def test_renorm_interval_preserves_decisions(rng):
    """Periodic shift-to-zero renormalisation must not change decoded bits,
    and path_metric must include the renormalised amount
    (ref: viterbi615_sse2.cpp:157-183)."""
    import dataclasses

    code = VITERBI27
    numeric = soft8_spec(code.R)
    numeric_rn = dataclasses.replace(numeric, renorm_interval=16)
    data = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))

    d0 = ViterbiDecoder(code, numeric, batch=2)
    d0.update(syms)
    d1 = ViterbiDecoder(code, numeric_rn, batch=2)
    d1.update(syms)

    np.testing.assert_array_equal(
        np.asarray(d0._decision_blocks[0]), np.asarray(d1._decision_blocks[0])
    )
    np.testing.assert_array_equal(np.asarray(d0.path_metric()), np.asarray(d1.path_metric()))
    # Noiseless channel: survivor at state 0 has zero accumulated error.
    np.testing.assert_array_equal(np.asarray(d0.path_metric()), 0)


def test_nonzero_start_state(rng):
    """init can bias any start state (ref: init_viterbi27_sse2 signature)."""
    code = VITERBI27
    numeric = soft8_spec(code.R)
    # Encode from state 0 but only check that biasing start=0 wins over junk.
    data = rng.integers(0, 256, size=(1, 16), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    dec = ViterbiDecoder(code, numeric, batch=1)
    dec.reset(starting_state=0)
    dec.update(syms)
    out = dec.chainback(16 * 8)
    assert count_bit_errors(np.asarray(out), data) == 0
