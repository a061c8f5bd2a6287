"""Radix-packed traceback (ops/radix.py): exactness vs the plain walk.

The radix fields are built by pure function composition over the decision
words, so agreement must hold for ARBITRARY word contents (random words walk
arbitrary survivor paths), any endstate, and any T (remainder segments).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ka9q_viterbi_comparison_tpu.configs import (
    VITERBI29,
    VITERBI615,
    soft8_spec,
)
from ka9q_viterbi_comparison_tpu.ops import acs, chainback as cb, radix
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors


def test_radix_plan_covers_and_aligns():
    for T in (8, 9, 15, 16, 23, 87, 174):
        segs = radix.radix_plan(T, 8)
        covered = [t for t0, w in segs for t in range(t0, t0 + w)]
        assert sorted(covered) == list(range(T))
        for t0, w in segs:
            assert w in (1, 2, 4, 8) and t0 % w == 0
        # walk order: descending t
        starts = [t0 for t0, _ in segs]
        assert starts == sorted(starts, reverse=True)


@pytest.mark.parametrize("code,T,B", [
    (VITERBI29, 87, 3),   # remainder 7 = 4+2+1
    (VITERBI29, 64, 2),   # exact multiple of 8
    (VITERBI615, 45, 2),  # remainder 5 = 4+1
])
@pytest.mark.parametrize("endstate", [0, 5])
def test_radix_walk_matches_plain_walk_on_random_words(code, T, B, endstate):
    rng = np.random.default_rng(42)
    W = max(1, code.num_states // 32)
    words = jnp.asarray(rng.integers(0, 2**32, size=(B, T, W), dtype=np.uint32))
    nbits = (T - code.K + 1) // 8 * 8
    ref_bits, ref_ss = cb.chainback_bits(code, words, nbits, endstate)
    tabs = radix.build_radix_tables(code, words)
    got_bits, got_ss = radix.chainback_radix_bits(code, words, tabs, nbits, endstate)
    np.testing.assert_array_equal(np.asarray(ref_bits), np.asarray(got_bits))
    np.testing.assert_array_equal(np.asarray(ref_ss), np.asarray(got_ss))


def test_radix_roundtrip_decode():
    code, numeric = VITERBI29, soft8_spec(2)
    rng = np.random.default_rng(7)
    B, nbytes = 2, 16
    data = rng.integers(0, 256, size=(B, nbytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
    m0 = acs.init_metrics(code, numeric, B)
    _, words, _ = acs.acs_update(code, numeric, m0, syms, True)
    tabs = radix.build_radix_tables(code, words)
    out = radix.chainback_radix(code, words, tabs, nbytes * 8)
    assert count_bit_errors(np.asarray(out), data) == 0


def test_radix_width_capped_at_small_n():
    """K=9 has n=8 so w=8 is legal; requesting w=8 on a trellis with n<8
    must cap rather than shift out of range."""
    code = VITERBI29
    rng = np.random.default_rng(1)
    W = max(1, code.num_states // 32)
    words = jnp.asarray(rng.integers(0, 2**32, size=(2, 24, W), dtype=np.uint32))
    tabs = radix.build_radix_tables(code, words, w=8)
    assert max(tabs) == 8
    got, _ = radix.chainback_radix_bits(code, words, tabs, 16, 0, w=8)
    ref, _ = cb.chainback_bits(code, words, 16, 0)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
