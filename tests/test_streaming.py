"""Streaming decoder: bounded-latency emission, agreement with batch decode,
and checkpoint/resume bit-exactness."""

import jax.numpy as jnp
import numpy as np

from ka9q_viterbi_comparison_tpu import VITERBI27, soft8_spec
from ka9q_viterbi_comparison_tpu.models.streaming import StreamingDecoder
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.utils.bits import bits_to_bytes, count_bit_errors


def _stream_decode(dec, syms, chunk_syms):
    parts = []
    for i in range(0, syms.shape[1], chunk_syms):
        parts.append(dec.push(syms[:, i : i + chunk_syms]))
    parts.append(dec.flush(endstate=0))
    return jnp.concatenate(parts, axis=1)


def test_streaming_matches_batch(rng):
    code, numeric = VITERBI27, soft8_spec(2)
    n_bytes = 256
    data = rng.integers(0, 256, size=(2, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))

    dec = StreamingDecoder(code, numeric, batch=2)
    bits = _stream_decode(dec, syms, chunk_syms=50 * code.R)
    out = bits_to_bytes(bits[:, : n_bytes * 8])
    assert count_bit_errors(np.asarray(out), data) == 0


def test_streaming_emits_with_bounded_latency(rng):
    """Bits must flow before the stream ends, not only at flush."""
    code, numeric = VITERBI27, soft8_spec(2)
    data = rng.integers(0, 256, size=(1, 256), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    dec = StreamingDecoder(code, numeric, batch=1, traceback_depth=64)
    released = dec.push(syms[:, : 200 * code.R])
    assert released.shape[1] > 0
    assert released.shape[1] <= 200  # can't emit beyond consumed steps


def test_checkpoint_resume_bit_exact(rng):
    code, numeric = VITERBI27, soft8_spec(2)
    n_bytes = 128
    data = rng.integers(0, 256, size=(2, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    half = (syms.shape[1] // (2 * code.R)) * code.R

    d0 = StreamingDecoder(code, numeric, batch=2)
    bits_a = d0.push(syms[:, :half])
    ckpt = d0.checkpoint()

    # Continue on a fresh decoder restored from the checkpoint.
    d1 = StreamingDecoder(code, numeric, batch=2)
    d1.restore(ckpt)
    bits_b = d1.push(syms[:, half:])
    bits_c = d1.flush(endstate=0)

    bits = jnp.concatenate([bits_a, bits_b, bits_c], axis=1)
    out = bits_to_bytes(bits[:, : n_bytes * 8])
    assert count_bit_errors(np.asarray(out), data) == 0


def test_streaming_pallas_backend_matches_jnp(rng, monkeypatch):
    """The dispatch-routed streaming update (VERDICT r4 item 5) must be
    bit-identical to the jnp route, including through the in-place
    kernel's position-packed decision words (rotation phases tracked
    across pushes via t0)."""
    code, numeric = VITERBI27, soft8_spec(2)
    n_bytes = 128
    data = rng.integers(0, 256, size=(2, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))

    ref_bits = _stream_decode(
        StreamingDecoder(code, numeric, batch=2, backend="jnp"),
        syms, chunk_syms=64 * code.R)

    # plain pallas route (interp mode on CPU)
    bits_pl = _stream_decode(
        StreamingDecoder(code, numeric, batch=2, backend="pallas"),
        syms, chunk_syms=64 * code.R)
    np.testing.assert_array_equal(np.asarray(bits_pl), np.asarray(ref_bits))

    # forced in-place route: rotated decision packing across push blocks
    monkeypatch.setenv("KA9Q_TPU_INPLACE", "1")
    dec = StreamingDecoder(code, numeric, batch=2, backend="pallas")
    assert dec._rotated
    bits_ip = _stream_decode(dec, syms, chunk_syms=64 * code.R)
    np.testing.assert_array_equal(np.asarray(bits_ip), np.asarray(ref_bits))

    out = bits_to_bytes(bits_ip[:, : n_bytes * 8])
    assert count_bit_errors(np.asarray(out), data) == 0


def test_restore_refuses_mismatched_history_packing(rng, monkeypatch):
    """A checkpoint taken on the rotated (in-place kernel) route must not
    silently restore onto a decoder whose history is state-ordered: the
    packing format is recorded and mismatches are refused."""
    import pytest

    code, numeric = VITERBI27, soft8_spec(2)
    monkeypatch.setenv("KA9Q_TPU_INPLACE", "1")
    rot = StreamingDecoder(code, numeric, batch=2, backend="pallas")
    assert rot._rotated
    data = rng.integers(0, 256, size=(2, 32), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    rot.push(syms[:, : 60 * code.R])
    state = rot.checkpoint()
    assert state["rotated_history"] is True

    plain = StreamingDecoder(code, numeric, batch=2, backend="jnp")
    with pytest.raises(ValueError, match="packing"):
        plain.restore(state)
    # same-route restore still works
    rot2 = StreamingDecoder(code, numeric, batch=2, backend="pallas")
    rot2.restore(state)
    assert rot2.abs_step == rot.abs_step
