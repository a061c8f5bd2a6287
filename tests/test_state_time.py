"""Composed state x time mesh decode vs the sequential path.

The composed mesh is the documented mitigation for statewise's O(T)
traceback collectives on long streams (parallel/state_time.py): each time
block runs the state-sharded butterfly ACS and its own block-local
truncated traceback.  Verified bit-exact against the sequential jnp decode
on the 8-device CPU mesh, including the actual K=24 ICE trellis at a
64-byte frame (the stream length the composition exists for)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ka9q_viterbi_comparison_tpu import VITERBI29, soft8_spec
from ka9q_viterbi_comparison_tpu.models.functional import decode_symbols
from ka9q_viterbi_comparison_tpu.parallel.state_time import (
    pad_to_time_blocks,
    state_time_decode,
)
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors


def _mesh(n_state, n_time):
    devs = np.array(jax.devices()[: n_state * n_time]).reshape(n_state, n_time)
    return Mesh(devs, ("state", "time"))


@pytest.mark.parametrize("n_state,n_time", [(1, 2), (2, 2), (4, 2), (2, 4)])
def test_state_time_matches_sequential(n_state, n_time, rng):
    code, n_bytes = VITERBI29, 32
    numeric = soft8_spec(code.R)
    data = rng.integers(0, 256, size=(2, n_bytes), dtype=np.uint8)
    from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames

    syms = encode_frames(code, numeric, jnp.asarray(data))
    T = code.transmit_bits(n_bytes)
    syms3 = syms.reshape(2, T, code.R)

    out = state_time_decode(
        code, numeric, syms3, n_bytes * 8, _mesh(n_state, n_time), overlap=32
    )
    assert count_bit_errors(np.asarray(out), data) == 0
    seq = decode_symbols(code, numeric, syms, n_bytes * 8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))


def test_pad_to_time_blocks_identity(rng):
    """Padding appends the state-0 self-loop symbols: the padded decode of a
    tail-terminated frame is unchanged and the pad decodes to zero bits."""
    code, n_bytes = VITERBI29, 8
    numeric = soft8_spec(code.R)
    data = rng.integers(0, 256, size=(1, n_bytes), dtype=np.uint8)
    from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames

    syms = encode_frames(code, numeric, jnp.asarray(data))
    T = code.transmit_bits(n_bytes)
    syms3 = syms.reshape(1, T, code.R)
    padded, pad = pad_to_time_blocks(code, numeric, syms3, 16)
    assert pad == (-T) % 16 and padded.shape[1] == T + pad

    out = decode_symbols(code, numeric, padded.reshape(1, -1), n_bytes * 8)
    assert count_bit_errors(np.asarray(out), data) == 0


@pytest.mark.slow
def test_state_time_viterbi224_long_stream(rng):
    """The actual K=24 ICE trellis (2^23 states) at a 64-byte frame --
    T = 535 trellis steps, ~6x the reference's ICE frames -- decoded on a
    (state=4, time=2) mesh, bit-exact vs the sequential jnp path.  K=24
    frames always have odd T, so this also exercises the zero-bit padding."""
    from ka9q_viterbi_comparison_tpu import VITERBI224
    from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames

    code = VITERBI224
    numeric = soft8_spec(code.R)
    n_bytes = 64
    data = rng.integers(0, 256, size=(1, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    T = code.transmit_bits(n_bytes)
    assert T % 2 == 1  # 8n + 23: padding is always required at K=24
    syms3 = syms.reshape(1, T, code.R)

    out = state_time_decode(
        code, numeric, syms3, n_bytes * 8, _mesh(4, 2), overlap=96
    )
    assert count_bit_errors(np.asarray(out), data) == 0

    seq = decode_symbols(code, numeric, syms, n_bytes * 8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))
