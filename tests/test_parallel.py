"""Multi-device sharding tests on the 8-device virtual CPU mesh
(the JAX analogue of multi-node testing without a cluster, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ka9q_viterbi_comparison_tpu import VITERBI27, VITERBI29, soft8_spec
from ka9q_viterbi_comparison_tpu.models.functional import decode_symbols
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.parallel import (
    frame_sharded_decode,
    make_frame_mesh,
    time_block_decode,
)
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors


def test_frame_sharded_decode_matches_unsharded(rng):
    code, numeric = VITERBI27, soft8_spec(2)
    n_bytes = 32
    data = rng.integers(0, 256, size=(8, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    mesh = make_frame_mesh()
    out = frame_sharded_decode(code, numeric, syms, n_bytes * 8, mesh)
    assert count_bit_errors(np.asarray(out), data) == 0


@pytest.mark.parametrize("code,n_bytes", [(VITERBI27, 256), (VITERBI29, 256)])
def test_time_block_decode_bit_exact(code, n_bytes, rng):
    """Time-block SP with overlap halos must reproduce the sequential decode
    exactly on a noiseless channel."""
    numeric = soft8_spec(code.R)
    data = rng.integers(0, 256, size=(2, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    B = syms.shape[0]
    T = code.transmit_bits(n_bytes)
    syms3 = syms.reshape(B, T, code.R)

    n_time = 4
    pad = (-T) % n_time
    if pad:
        # Pad with erasure symbols past the tail; decisions there are never
        # traced through (the last block's true end is forced to state 0).
        mid = (numeric.soft_high + numeric.soft_low) // 2
        syms3 = jnp.pad(syms3, ((0, 0), (0, pad), (0, 0)), constant_values=mid)

    devices = np.array(jax.devices()[: n_time * 2]).reshape(2, n_time)
    mesh = Mesh(devices, ("frame", "time"))
    out = time_block_decode(code, numeric, syms3, n_bytes * 8, mesh)
    assert count_bit_errors(np.asarray(out), data) == 0

    seq = decode_symbols(code, numeric, syms, n_bytes * 8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(seq))


def test_time_block_time_only_mesh(rng):
    """The time axis alone (no frame axis in the mesh) must also work."""
    code, numeric = VITERBI27, soft8_spec(2)
    n_bytes = 128
    data = rng.integers(0, 256, size=(1, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    T = code.transmit_bits(n_bytes)
    syms3 = syms.reshape(1, T, code.R)
    pad = (-T) % 2
    mid = (numeric.soft_high + numeric.soft_low) // 2
    syms3 = jnp.pad(syms3, ((0, 0), (0, pad), (0, 0)), constant_values=mid)
    mesh = Mesh(np.array(jax.devices()[:2]), ("time",))
    out = time_block_decode(code, numeric, syms3, n_bytes * 8, mesh)
    assert count_bit_errors(np.asarray(out), data) == 0
