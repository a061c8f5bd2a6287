"""AWGN-channel decode tests: the noisy operating points the reference's
soft-decision machinery implies but never exercises (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from ka9q_viterbi_comparison_tpu import VITERBI27, soft8_spec, soft16_spec
from ka9q_viterbi_comparison_tpu.models.functional import decode_symbols
from ka9q_viterbi_comparison_tpu.ops.channel import awgn_symbols, ebn0_sigma
from ka9q_viterbi_comparison_tpu.utils.bits import bit_error_rate


def test_high_snr_decodes_clean(rng):
    """At Eb/N0 = 10 dB a K=7 code must decode essentially error-free."""
    code, numeric = VITERBI27, soft16_spec(2)
    data = rng.integers(0, 256, size=(4, 128), dtype=np.uint8)
    syms = awgn_symbols(code, numeric, jax.random.key(0), jnp.asarray(data), 10.0)
    out = decode_symbols(code, numeric, syms, 128 * 8)
    assert bit_error_rate(np.asarray(out), data) == 0.0


def test_coding_gain_over_uncoded(rng):
    """At ~4 dB the decoder must fix most channel errors: decoded BER far
    below the raw channel symbol error rate."""
    code, numeric = VITERBI27, soft16_spec(2)
    data = rng.integers(0, 256, size=(16, 64), dtype=np.uint8)
    ebn0 = 4.0
    syms = awgn_symbols(code, numeric, jax.random.key(1), jnp.asarray(data), ebn0)
    out = decode_symbols(code, numeric, syms, 64 * 8)
    ber = bit_error_rate(np.asarray(out), data)

    # Raw channel hard-decision error rate at this sigma is ~1e-2.
    sigma = ebn0_sigma(code, ebn0)
    assert sigma > 0.3  # sanity: the channel is genuinely noisy
    assert ber < 2e-3, f"decoded BER {ber} shows no coding gain"


def test_soft_beats_hard_decisions(rng):
    """Soft-decision decoding must outperform 1-bit hard decisions of the
    same received stream at a moderately noisy operating point."""
    code = VITERBI27
    soft = soft16_spec(2)
    data = rng.integers(0, 256, size=(32, 64), dtype=np.uint8)
    syms = awgn_symbols(code, soft, jax.random.key(2), jnp.asarray(data), 2.0)
    out_soft = decode_symbols(code, soft, syms, 64 * 8)
    ber_soft = bit_error_rate(np.asarray(out_soft), data)

    mid = (soft.soft_high + soft.soft_low) / 2.0
    hard = jnp.where(syms > mid, soft.soft_high, soft.soft_low).astype(jnp.int32)
    out_hard = decode_symbols(code, soft, hard, 64 * 8)
    ber_hard = bit_error_rate(np.asarray(out_hard), data)
    assert ber_soft < ber_hard, (ber_soft, ber_hard)
