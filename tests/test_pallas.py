"""Pallas kernel correctness vs the jnp scan path (interpreter mode on CPU).

The jnp path is itself validated against the NumPy oracle and the noiseless
round-trip invariant, so agreement here transitively validates the kernels
(the reference's cross-implementation oracle strategy, SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ka9q_viterbi_comparison_tpu import (
    VITERBI27,
    VITERBI29,
    VITERBI47,
    VITERBI615,
    ViterbiDecoder,
    soft8_spec,
    soft16_spec,
)
from ka9q_viterbi_comparison_tpu.ops import acs
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops.pallas import dispatch
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors

CASES = [
    (VITERBI27, 32),
    (VITERBI47, 32),
    (VITERBI29, 16),
    (VITERBI615, 4),
]


@pytest.mark.parametrize("code,n_bytes", CASES, ids=lambda c: getattr(c, "name", c))
def test_pallas_update_matches_jnp(code, n_bytes, rng):
    numeric = soft8_spec(code.R)
    B = 3
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)

    m0 = acs.init_metrics(code, numeric, B)
    m_ref, words_ref, _ = acs.acs_update(code, numeric, m0, syms, False)
    m_pl, words_pl, _ = dispatch.acs_update(code, numeric, m0, syms)

    np.testing.assert_array_equal(np.asarray(m_pl), np.asarray(m_ref))
    if dispatch.use_inplace(code, dispatch._pad_batch(B)):
        # The in-place rotating-address kernel packs decision words in
        # *position* order, so raw words are not comparable against the
        # state-ordered jnp path; the invariant is identical decoded bytes
        # through each path's own traceback.
        from ka9q_viterbi_comparison_tpu.ops import chainback as cb

        out_ref = cb.chainback(code, words_ref, n_bytes * 8)
        out_pl = dispatch.chainback(code, words_pl, n_bytes * 8)
        np.testing.assert_array_equal(np.asarray(out_pl), np.asarray(out_ref))
    else:
        np.testing.assert_array_equal(np.asarray(words_pl), np.asarray(words_ref))


@pytest.mark.parametrize("code,n_bytes", CASES[:2], ids=lambda c: getattr(c, "name", c))
def test_pallas_chainback_roundtrip(code, n_bytes, rng):
    numeric = soft8_spec(code.R)
    B = 2
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    dec = ViterbiDecoder(code, numeric, batch=B, backend="pallas")
    dec.update(syms)
    out = dec.chainback(n_bytes * 8)
    assert count_bit_errors(np.asarray(out), data) == 0


@pytest.mark.parametrize("code,n_bytes", [(VITERBI27, 8), (VITERBI615, 4)],
                         ids=["viterbi27", "viterbi615"])
def test_inplace_route_matches_jnp(code, n_bytes, rng, monkeypatch):
    """The in-place rotating-address route (forced via KA9Q_TPU_INPLACE=1)
    must agree with the jnp path: identical metrics, identical decoded
    bytes (its decision words are position-packed, so raw words are not
    comparable -- the traceback must route through chainback_inplace).
    Covers both a small-K config (default route at full lane groups) and
    the K=15 config."""
    from ka9q_viterbi_comparison_tpu.ops import chainback as cb

    monkeypatch.setenv("KA9Q_TPU_INPLACE", "1")
    numeric = soft8_spec(code.R)
    B = 3
    assert dispatch.use_inplace(code, B)
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)

    m0 = acs.init_metrics(code, numeric, B)
    m_ref, words_ref, _ = acs.acs_update(code, numeric, m0, syms, False)
    m_pl, words_pl, _ = dispatch.acs_update(code, numeric, m0, syms)
    np.testing.assert_array_equal(np.asarray(m_pl), np.asarray(m_ref))

    out_ref = cb.chainback(code, words_ref, n_bytes * 8)
    out_pl = dispatch.chainback(code, words_pl, n_bytes * 8)
    np.testing.assert_array_equal(np.asarray(out_pl), np.asarray(out_ref))


def test_batch_adaptive_routing(rng, monkeypatch):
    """The B-dependent kernel switch (dispatch._small_k_impl): the depth-2
    fused kernel serves padded batches >= 1024, the single-step kernel below;
    and the dispatch-level output at a routed >=1024 batch is bit-identical
    to the jnp path (pins the switch against silent regression).  The
    in-place route is disabled so the kernels2 path is the one exercised."""
    from ka9q_viterbi_comparison_tpu.ops.pallas import kernels, kernels2

    monkeypatch.setenv("KA9Q_TPU_INPLACE", "0")
    assert dispatch._small_k_impl(512) is kernels.acs_update_tb
    assert dispatch._small_k_impl(1024) is kernels2.acs_update_tb2
    assert dispatch._small_k_impl(2048) is kernels2.acs_update_tb2

    code, numeric = VITERBI27, soft8_spec(2)
    B, n_bytes = 1024, 2  # on CPU the batch is not padded: Bp == B == 1024
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
    m0 = acs.init_metrics(code, numeric, B)
    m_ref, words_ref, _ = acs.acs_update(code, numeric, m0, syms, False)
    m_pl, words_pl, _ = dispatch.acs_update(code, numeric, m0, syms)
    np.testing.assert_array_equal(np.asarray(m_pl), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(words_pl), np.asarray(words_ref))


def test_pallas_phase_fns_roundtrip(rng):
    code = VITERBI29
    numeric = soft16_spec(code.R)
    B, n_bytes = 2, 16
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)

    init_fn, update_fn, chainback_fn, prepare_fn, _, _ = dispatch.phase_fns(
        code, numeric, n_bytes * 8
    )
    m = init_fn(B)
    _, words, _ = update_fn(m, prepare_fn(syms))
    out = chainback_fn(words)
    assert count_bit_errors(np.asarray(out), data) == 0


def test_large_k_phase_fns_roundtrip(rng):
    """The large-K lifecycle through dispatch.phase_fns (depth-4 routed
    update + batched traceback), interpret mode on a mid-size R=2 trellis
    (the K=24 route's exact code path at CPU-testable scale)."""
    from ka9q_viterbi_comparison_tpu import CodeSpec

    code = CodeSpec("k12r2", K=12, R=2, polys=(0o6731, 0o5247))
    numeric = soft8_spec(code.R)
    B, n_bytes = 2, 8
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)

    init_fn, update_fn, chainback_fn, prepare_fn, _, _ = dispatch.phase_fns(
        code, numeric, n_bytes * 8, batch=B
    )
    m = init_fn(B)
    _, words, _ = update_fn(m, prepare_fn(syms))
    out = chainback_fn(words)
    assert count_bit_errors(np.asarray(out), data) == 0


def test_inplace_admission_respects_validated_envelope():
    """fits_inplace_vmem gates on the measured-correctness envelope, not
    just the VMEM budget: K=15 at padded batch 512 FITS the aliased
    kernel's VMEM but mis-lowers on the current Mosaic toolchain (silently
    wrong metrics on chip -- tools/k15_chunk_sweep.py exactness gate), so
    admission must reject it while keeping the verified points."""
    from ka9q_viterbi_comparison_tpu import VITERBI27, VITERBI615

    assert dispatch.fits_inplace_vmem(VITERBI27, 512)
    assert dispatch.fits_inplace_vmem(VITERBI615, 256)
    assert not dispatch.fits_inplace_vmem(VITERBI615, 512)


def test_inplace_word_pack_lever_exact(rng, monkeypatch):
    """The word-granularity decision interleave (KA9Q_TPU_INPLACE_WORD_PACK,
    the 2^j >= 32 strided-phase A/B lever) must be bit-identical to the
    element-restack pack on the K=15 trellis (the only config with such
    phases)."""
    from ka9q_viterbi_comparison_tpu.ops import chainback as cb

    monkeypatch.setenv("KA9Q_TPU_INPLACE", "1")
    code, numeric = VITERBI615, soft8_spec(6)
    # distinct (B, T) from every other K=15 inplace test: flags are read at
    # trace time, so the lever needs a fresh static configuration
    B, n_bytes = 5, 6
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
    m0 = acs.init_metrics(code, numeric, B)
    m_ref, words_ref, _ = acs.acs_update(code, numeric, m0, syms, False)

    monkeypatch.setenv("KA9Q_TPU_INPLACE_WORD_PACK", "1")
    # fresh static shape so the flag is re-read at trace time
    m_pl, words_pl, _ = dispatch.acs_update(code, numeric, m0, syms, t0=0)
    np.testing.assert_array_equal(np.asarray(m_pl), np.asarray(m_ref))
    out_ref = cb.chainback(code, words_ref, n_bytes * 8)
    out_pl = dispatch.chainback(code, words_pl, n_bytes * 8)
    np.testing.assert_array_equal(np.asarray(out_pl), np.asarray(out_ref))
