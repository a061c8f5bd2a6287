"""State-sharded (K=24-style) trellis decode vs the sequential path.

Runs the sharded butterfly-exchange algorithm on smaller trellises so the
8-device CPU mesh can verify it quickly; the algorithm is size-generic, so
agreement here validates the K=24 configuration's communication pattern."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ka9q_viterbi_comparison_tpu import VITERBI29, VITERBI615, soft8_spec
from ka9q_viterbi_comparison_tpu.models.functional import decode_symbols
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.parallel.statewise import state_sharded_decode
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
@pytest.mark.parametrize("code,n_bytes", [(VITERBI29, 32), (VITERBI615, 4)],
                         ids=["viterbi29", "viterbi615"])
def test_state_sharded_matches_sequential(code, n_bytes, n_dev, rng):
    numeric = soft8_spec(code.R)
    data = rng.integers(0, 256, size=(2, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    T = code.transmit_bits(n_bytes)
    syms3 = syms.reshape(2, T, code.R)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("state",))
    out = state_sharded_decode(code, numeric, syms3, n_bytes * 8, mesh)
    assert count_bit_errors(np.asarray(out), data) == 0

    seq = decode_symbols(code, numeric, syms, n_bytes * 8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))


@pytest.mark.slow
def test_state_sharded_viterbi224(rng):
    """The actual K=24 ICE trellis (2^23 states, the config the state axis
    exists for, ref: viterbi224_sse2.cpp:14-16) decoded sharded over the
    8-device mesh at 2-byte frames, bit-exact vs the sequential jnp path."""
    from ka9q_viterbi_comparison_tpu import VITERBI224

    code = VITERBI224
    numeric = soft8_spec(code.R)
    n_bytes = 2
    data = rng.integers(0, 256, size=(1, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    T = code.transmit_bits(n_bytes)
    syms3 = syms.reshape(1, T, code.R)

    mesh = Mesh(np.array(jax.devices()[:8]), ("state",))
    out = state_sharded_decode(code, numeric, syms3, n_bytes * 8, mesh)
    assert count_bit_errors(np.asarray(out), data) == 0

    seq = decode_symbols(code, numeric, syms, n_bytes * 8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))
