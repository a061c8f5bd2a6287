"""BER measurement harness sanity."""

from ka9q_viterbi_comparison_tpu import VITERBI27, soft16_spec
from ka9q_viterbi_comparison_tpu.harness.ber import measure_ber


def test_ber_monotone_in_snr():
    code, spec = VITERBI27, soft16_spec(2)
    lo = measure_ber(code, spec, 0.0, frame_bytes=32, batch=16,
                     min_errors=20, max_bits=200_000)
    hi = measure_ber(code, spec, 6.0, frame_bytes=32, batch=16,
                     min_errors=20, max_bits=200_000)
    assert lo.ber > hi.ber
    assert lo.bits > 0 and lo.errors > 0
    # 6 dB with K=7 soft decisions: essentially error-free at this sample size.
    assert hi.ber < 1e-3
