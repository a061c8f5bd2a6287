"""Truncated (non-tail-terminated) decoding and blockwise pallas updates."""

import jax.numpy as jnp
import numpy as np

from ka9q_viterbi_comparison_tpu import VITERBI27, ViterbiDecoder, soft8_spec
from ka9q_viterbi_comparison_tpu.ops import acs
from ka9q_viterbi_comparison_tpu.ops.chainback import chainback_bits
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_bits
from ka9q_viterbi_comparison_tpu.utils.bits import bytes_to_bits, count_bit_errors


def test_truncated_decode_from_best_state(rng):
    """No tail: trace back from the argmin state; all but the last ~5K data
    bits must still be correct (truncated-Viterbi property)."""
    code, numeric = VITERBI27, soft8_spec(2)
    n_bytes = 64
    data = rng.integers(0, 256, size=(2, n_bytes), dtype=np.uint8)
    bits = bytes_to_bits(jnp.asarray(data))
    enc = encode_bits(code, bits)[:, : n_bytes * 8, :]  # drop tail steps
    syms = jnp.where(enc.astype(bool), numeric.soft_high, numeric.soft_low)

    m = acs.init_metrics(code, numeric, 2)
    m, words, _ = acs.acs_update(code, numeric, m, syms.astype(jnp.int32), False)
    best = jnp.argmin(m, axis=-1).astype(jnp.int32)

    out_bits, start = chainback_bits(code, words, n_bytes * 8 - (code.K - 1), best)
    # Compare all emitted bits except the unconverged last ~5K.
    depth = 5 * code.K
    ref_bits = np.asarray(bits)[:, : out_bits.shape[1]]
    got = np.asarray(out_bits)
    assert (got[:, :-depth] == ref_bits[:, :-depth]).all()
    np.testing.assert_array_equal(np.asarray(start), 0)


def test_pallas_blockwise_update(rng):
    """The pallas backend must be resumable across update calls exactly like
    the reference's blockwise update (ref: viterbi27_sse2.cpp:119)."""
    code, numeric = VITERBI27, soft8_spec(2)
    n_bytes = 64
    data = rng.integers(0, 256, size=(2, n_bytes), dtype=np.uint8)
    from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames

    syms = encode_frames(code, numeric, jnp.asarray(data))

    dec = ViterbiDecoder(code, numeric, batch=2, backend="pallas")
    split = 137 * code.R  # odd split point, not a kernel block multiple
    dec.update(syms[:, :split])
    dec.update(syms[:, split:])
    out = dec.chainback(n_bytes * 8)
    assert count_bit_errors(np.asarray(out), data) == 0


def test_inplace_blockwise_update(rng, monkeypatch):
    """K=15 through the (experimental, env-gated) in-place rotating-address
    kernel; blockwise resume must thread the global step cursor so rotation
    phases (and decision packing positions) stay consistent across blocks.
    The split is odd w.r.t. both the K-1 rotation period and the kernel
    time block."""
    from ka9q_viterbi_comparison_tpu import VITERBI615
    from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
    from ka9q_viterbi_comparison_tpu.ops.pallas import dispatch

    monkeypatch.setenv("KA9Q_TPU_INPLACE", "1")
    code = VITERBI615
    numeric = soft8_spec(code.R)
    assert dispatch.use_inplace(code, 2)  # pin: the route under test
    n_bytes = 8
    data = rng.integers(0, 256, size=(2, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))

    dec = ViterbiDecoder(code, numeric, batch=2, backend="pallas")
    split = 37 * code.R  # 37 % 14 == 9: mid-rotation-cycle resume
    dec.update(syms[:, :split])
    dec.update(syms[:, split:])
    out = dec.chainback(n_bytes * 8)
    assert count_bit_errors(np.asarray(out), data) == 0

    # Blockwise metrics must match the whole-frame decode exactly.
    whole = ViterbiDecoder(code, numeric, batch=2, backend="pallas")
    whole.update(syms)
    np.testing.assert_array_equal(np.asarray(dec.metrics), np.asarray(whole.metrics))
