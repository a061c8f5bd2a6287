"""State-blocked (large-K) kernel vs the jnp path, interpreter mode.

The kernel is size-generic; running it on K=9/K=15 trellises on CPU validates
the exact code path K=24 uses on hardware (block index maps, in-kernel parity
penalties, lane packing)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ka9q_viterbi_comparison_tpu import VITERBI29, VITERBI615, soft8_spec
from ka9q_viterbi_comparison_tpu.ops import acs, chainback as cb
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors


@pytest.mark.parametrize("code,n_bytes", [(VITERBI29, 16), (VITERBI615, 4)],
                         ids=["viterbi29", "viterbi615"])
def test_large_k_matches_jnp(code, n_bytes, rng):
    numeric = soft8_spec(code.R)
    B = 2
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)

    m0 = acs.init_metrics(code, numeric, B)
    m_ref, words_ref, _ = acs.acs_update(code, numeric, m0, syms, False)
    m_lg, words_lg, off = large_k.acs_update_large(
        code, numeric, acs.init_metrics(code, numeric, B), syms, True
    )
    # Fresh metrics have min 0, so the block-entry shift is zero.
    np.testing.assert_array_equal(np.asarray(off), 0)
    np.testing.assert_array_equal(np.asarray(m_lg), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(words_lg), np.asarray(words_ref))

    out = cb.chainback(code, words_lg, n_bytes * 8)
    assert count_bit_errors(np.asarray(out), data) == 0


@pytest.mark.parametrize("code,n_bytes", [(VITERBI29, 16), (VITERBI615, 4)],
                         ids=["viterbi29", "viterbi615"])
def test_large_k2_matches_jnp(code, n_bytes, rng):
    """Depth-2 fused kernel: bit-identical metrics and decision words."""
    from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2

    numeric = soft8_spec(code.R)
    B = 2
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)

    m0 = acs.init_metrics(code, numeric, B)
    m_ref, words_ref, _ = acs.acs_update(code, numeric, m0, syms, False)
    m2, words2, _ = large_k2.acs_update_large2(code, numeric, m0, syms, True)
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(words2), np.asarray(words_ref))


def test_par_tables_match_parity_fold():
    """The static parity tables (the R<=2 fast path's only data source for
    branch parities) must agree with the in-kernel fold formula everywhere,
    including the actual K=24 ICE code (ref polys viterbi224_sse2.cpp)."""
    from ka9q_viterbi_comparison_tpu import VITERBI224
    from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2

    def parity(x):
        x = np.asarray(x, np.int64)
        for s in (32, 16, 8, 4, 2, 1):
            x = x ^ (x >> s)
        return (x & 1).astype(np.int32)

    for code in (VITERBI29, VITERBI224):
        S = code.num_states
        C = S // large_k2.PACK
        t0, t1 = large_k2._par_tables_np(code)
        g = np.arange(large_k2.PACK)[:, None]
        # Spot-column subsets keep the K=24 check cheap.
        cols = np.unique(np.linspace(0, C // 2 - 1, 512, dtype=np.int64))
        c_abs = np.unique(np.linspace(0, C // 4 - 1, 512, dtype=np.int64))
        for r, p in enumerate(code.abs_polys()):
            np.testing.assert_array_equal(
                (t0[:, cols] >> r) & 1, parity((cols * 32 + g) & (p >> 1)))
            for b1 in (0, 1):
                np.testing.assert_array_equal(
                    (t1[b1][:, c_abs] >> r) & 1,
                    parity((64 * c_abs + 2 * g + b1) & (p >> 1)))


def test_large_k_blockwise_resume_narrow_safe(rng):
    """Resumed blocks whose incoming metrics carry accumulated error must not
    wrap the int16 storage path: the block-entry shift-to-zero renormalisation
    makes ``metric_dtype_for``'s bound hold regardless of history, and the
    shift comes back as the offset (keeps ``path_metric`` exact)."""
    from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2

    code, numeric = VITERBI29, soft8_spec(2)
    B = 2
    data = rng.integers(0, 256, size=(B, 16), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
    T = syms.shape[1]
    assert large_k.metric_dtype_for(code, numeric, T) == jnp.int16

    # Incoming metrics as if ~30k steps of error had accumulated: well beyond
    # int16, identical decisions (a uniform bump changes no compare).
    bump = 30_000
    m0 = acs.init_metrics(code, numeric, B) + bump
    m_ref, words_ref, _ = acs.acs_update(
        code, numeric, acs.init_metrics(code, numeric, B), syms, False
    )
    for fn in (large_k.acs_update_large, large_k2.acs_update_large2):
        m, words, off = fn(code, numeric, m0, syms, True)
        np.testing.assert_array_equal(np.asarray(words), np.asarray(words_ref))
        np.testing.assert_array_equal(np.asarray(off), bump)
        np.testing.assert_array_equal(
            np.asarray(m) + np.asarray(off)[:, None],
            np.asarray(m_ref) + bump,
        )


def test_large_k2_odd_tail(rng):
    """Odd step counts route the final step through the single-step kernel
    (K=8 gives odd T; K=24's frames are always odd)."""
    from ka9q_viterbi_comparison_tpu import CodeSpec
    from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2

    code = CodeSpec("k8r2", K=8, R=2, polys=(0o357, 0o251))
    numeric = soft8_spec(2)
    data = rng.integers(0, 256, size=(2, 8), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(2, -1, 2)
    assert syms.shape[1] % 2 == 1
    m0 = acs.init_metrics(code, numeric, 2)
    m_ref, words_ref, _ = acs.acs_update(code, numeric, m0, syms, False)
    m2, words2, _ = large_k2.acs_update_large2(code, numeric, m0, syms, True)
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(words2), np.asarray(words_ref))


def test_large_k2_residue_carry_matches_baseline(rng, monkeypatch):
    """The residue-split scan carry (KA9Q_TPU_LK2_RESIDUE=1, the default:
    metrics stay in the kernel's mod-4 column-residue output representation
    between pairs, interleaved back to natural order in VMEM) must produce
    bit-identical metrics/words/offset to the whole-array natural-order
    carry it replaces."""
    from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2

    code, numeric = VITERBI29, soft8_spec(2)
    B = 2
    data = rng.integers(0, 256, size=(B, 12), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
    m0 = acs.init_metrics(code, numeric, B)

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("KA9Q_TPU_LK2_RESIDUE", flag)
        m, w, off = large_k2.acs_update_large2.__wrapped__(
            code, numeric, m0, syms, True, None)
        outs[flag] = (np.asarray(m), np.asarray(w), np.asarray(off))
    for a, b in zip(outs["0"], outs["1"]):
        np.testing.assert_array_equal(a, b)


def test_large_k2_inscan_renorm_ob_int16(rng):
    """Offset-binary symbols overflow int16 over a whole block (510/step
    branch errors), so the depth-2 kernel's auto policy now picks int16
    storage with in-scan renormalisation every `rn` pairs.  Metrics + words
    must stay bit-identical to the int32 jnp path up to the renorm shift,
    with the shift returned in the offset (path_metric exactness, ref
    semantics: viterbi224_sse2.cpp:226-250)."""
    import jax

    from ka9q_viterbi_comparison_tpu import ka9q_offset_binary_spec
    from ka9q_viterbi_comparison_tpu.ops.channel import awgn_symbols
    from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2

    code = VITERBI29
    numeric = ka9q_offset_binary_spec()
    B, n_bytes = 2, 16  # T = 136: whole-block worst ~79k >> int16; rn = 23
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    # Noisy symbols: on a noiseless stream the running minimum (the true
    # path's accumulated error) stays 0 and renorm is a no-op; AWGN makes
    # every path accumulate error, so the shift must actually fire.
    syms = awgn_symbols(code, numeric, jax.random.key(5), jnp.asarray(data),
                        2.0).reshape(B, -1, code.R)

    m0 = acs.init_metrics(code, numeric, B)
    m_ref, words_ref, _ = acs.acs_update(code, numeric, m0, syms, False)
    m2, words2, off = large_k2.acs_update_large2(
        code, numeric, m0, syms, True, "auto")
    # Renorm must actually have fired (nonzero accumulated shift) ...
    assert (np.asarray(off) > 0).all()
    # ... decisions are shift-invariant, and metrics + offset restore the
    # exact accumulated path errors.
    np.testing.assert_array_equal(np.asarray(words2), np.asarray(words_ref))
    np.testing.assert_array_equal(
        np.asarray(m2) + np.asarray(off)[:, None], np.asarray(m_ref))


def test_large_k4_matches_jnp(rng):
    """Depth-4 fused kernel (quads + large_k2 remainder): bit-identical
    metrics and decision words, including the chainback roundtrip."""
    from ka9q_viterbi_comparison_tpu import CodeSpec
    from ka9q_viterbi_comparison_tpu.ops.pallas import large_k4

    code = CodeSpec("k12r2", K=12, R=2, polys=(0o6731, 0o5247))
    numeric = soft8_spec(code.R)
    B, n_bytes = 2, 4
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
    m0 = acs.init_metrics(code, numeric, B)
    m_ref, words_ref, _ = acs.acs_update(code, numeric, m0, syms, False)
    m4, words4, off = large_k4.acs_update_large4(code, numeric, m0, syms, True)
    np.testing.assert_array_equal(np.asarray(off), 0)
    np.testing.assert_array_equal(np.asarray(m4), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(words4), np.asarray(words_ref))
    out = cb.chainback(code, words4, n_bytes * 8)
    assert count_bit_errors(np.asarray(out), data) == 0


@pytest.mark.parametrize("T", [16, 17, 18, 19])
def test_large_k4_remainders(rng, T):
    """Every T mod 4 remainder path (0..3) over random symbols: the quad
    scan composes with large_k2's pair + odd-tail delegation exactly, and
    time-major output matches the transpose."""
    from ka9q_viterbi_comparison_tpu import CodeSpec
    from ka9q_viterbi_comparison_tpu.ops.pallas import large_k4

    code = CodeSpec("k12r2", K=12, R=2, polys=(0o6731, 0o5247))
    numeric = soft8_spec(code.R)
    B = 2
    syms = jnp.asarray(
        rng.integers(numeric.soft_low, numeric.soft_high + 1,
                     size=(B, T, code.R)), jnp.int32)
    m0 = acs.init_metrics(code, numeric, B)
    m_ref, words_ref, _ = acs.acs_update(code, numeric, m0, syms, False)
    m4, words4, off = large_k4.acs_update_large4(code, numeric, m0, syms, True)
    # The remainder delegation shift-to-zeroes at entry; the shift comes
    # back in the offset (path-metric exactness contract).
    np.testing.assert_array_equal(
        np.asarray(m4 + off[:, None]), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(words4), np.asarray(words_ref))
    _, words_tm, _ = large_k4.acs_update_large4(
        code, numeric, m0, syms, True, None, True)
    np.testing.assert_array_equal(
        np.asarray(words_tm), np.asarray(words_ref.transpose(1, 0, 2)))
