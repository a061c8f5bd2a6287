"""Validation against the REFERENCE's actual decoders (external oracle).

Compiles the reference's unmodified ka9q/SPIRAL sources into a shim
(`native/ref_oracle_shim.cpp`, built by `tools/ref_oracle.py`) and asserts:

* noiseless streams produced by OUR encoder decode byte-identically
  through the reference binaries for every shared config (the reference's
  own correctness invariant, ref: src/main.cpp:110-115);
* our decoder output equals the reference binaries' output on those
  streams (true external bit-exactness, not transitive-via-own-oracle);
* the measured v224 endstate contract: the reference harness's
  ``endstate=0`` call discards the last K-1 data bits (they are still in
  the encoder register, viterbi224_sse2.cpp:93-105); with the true final
  register passed, recovery is complete.  Our framework's walk uses the
  tail decisions instead and recovers every bit with endstate=0.

Noisy-channel decision agreement (where ka9q's u8-modulo metric
compression may diverge from this framework's int32-exact arithmetic) is
measured, not asserted: tools/parity_probe.py, published in PARITY.md.

Skips when /root/reference or a C++ toolchain is unavailable.
"""

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import ref_oracle

import jax.numpy as jnp

from ka9q_viterbi_comparison_tpu.configs import (
    VITERBI27,
    VITERBI29,
    VITERBI47,
    VITERBI49,
    VITERBI615,
    VITERBI224,
    ka9q_offset_binary_spec,
)
from ka9q_viterbi_comparison_tpu.models.functional import decode_symbols
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames

pytestmark = pytest.mark.skipif(
    not ref_oracle.available(),
    reason="reference tree or C++ toolchain unavailable",
)

CASES = [
    ("v27", VITERBI27, 32),
    ("v29", VITERBI29, 32),
    ("v615_fixed", VITERBI615, 8),
    ("spiral27", VITERBI27, 32),
    ("spiral29", VITERBI29, 32),
    ("spiral47", VITERBI47, 32),
    ("spiral49", VITERBI49, 32),
    ("spiral615", VITERBI615, 8),
]

NUMERIC = ka9q_offset_binary_spec()


def _frame(code, nbytes, rng):
    data = rng.integers(0, 256, size=(1, nbytes), dtype=np.uint8)
    syms = np.asarray(
        encode_frames(code, NUMERIC, jnp.asarray(data))
    ).astype(np.uint8)
    return data, syms


@pytest.mark.parametrize("family,code,nbytes",
                         CASES, ids=[c[0] for c in CASES])
def test_reference_binary_decodes_our_encoding(family, code, nbytes, rng):
    """Noiseless: the reference binary recovers our encoder's stream, and
    our decoder's output is byte-identical to the reference binary's."""
    data, syms = _frame(code, nbytes, rng)
    ref_out, _ = ref_oracle.decode(family, code.polys, syms[0], nbytes * 8)
    np.testing.assert_array_equal(ref_out, data[0])

    ours = np.asarray(
        decode_symbols(code, NUMERIC, jnp.asarray(syms.astype(np.int32)),
                       nbytes * 8))
    np.testing.assert_array_equal(ours[0], ref_out)


def test_v615_lp64_chainback_bug(rng):
    """The shipped v615 chainback reads decisions as `unsigned long
    w[512]` with 32-bit-word index arithmetic (viterbi615_sse2.cpp:13,
    :85); on LP64 platforms the union layout differs from what update
    wrote through `s[1024]`, so the reference's own Linux builds
    mis-decode K=15 even noiselessly.  The reference's UPDATE decisions
    are correct: the intended walk over them recovers everything."""
    code, nbytes = VITERBI615, 8
    data, syms = _frame(code, nbytes, rng)
    shipped, _ = ref_oracle.decode("v615", code.polys, syms[0], nbytes * 8)
    fixed, _ = ref_oracle.decode("v615_fixed", code.polys, syms[0],
                                 nbytes * 8)
    np.testing.assert_array_equal(fixed, data[0])
    assert not np.array_equal(shipped, data[0])


def test_v224_endstate_contract(rng):
    """The reference v224 walk emits state bits with a K-1 step delay:
    endstate=0 (the harness call) loses the last 23 data bits; the true
    final register recovers everything.  Our decoder recovers everything
    at endstate=0 (it walks the tail decisions)."""
    code, nbytes = VITERBI224, 8
    data, syms = _frame(code, nbytes, rng)

    # as the reference harness drives it (src/ka9q_interface.h:53-55):
    # the last K-1 data bits are unrecoverable (they are emitted straight
    # from the zero endstate), and the wrong start state can perturb
    # earlier bits too until the backward walk re-converges (convergence
    # depth ~5K exceeds the 64-bit frame at K=24).
    out0, _ = ref_oracle.decode("v224", code.polys, syms[0], nbytes * 8, 0)
    bits_ref = np.unpackbits(out0)
    bits_data = np.unpackbits(data[0])
    tail = slice(nbytes * 8 - (code.K - 1), None)
    assert np.any(bits_ref[tail] != bits_data[tail])

    # with the true final register: full recovery
    es = ref_oracle.v224_true_endstate(data[0])
    out1, _ = ref_oracle.decode("v224", code.polys, syms[0], nbytes * 8, es)
    np.testing.assert_array_equal(out1, data[0])

    # ours: full recovery at endstate=0
    ours = np.asarray(
        decode_symbols(code, NUMERIC, jnp.asarray(syms.astype(np.int32)),
                       nbytes * 8))
    np.testing.assert_array_equal(ours[0], data[0])


@pytest.mark.parametrize("family,code,nbytes",
                         CASES, ids=[c[0] for c in CASES])
def test_reference_agreement_under_mild_noise(family, code, nbytes, rng):
    """At a mild operating point (within the code's correction power)
    both stacks still decode perfectly, hence agree bit-for-bit.  The
    near-threshold divergence (u8 metric quantization vs int32-exact) is
    measured in tools/parity_probe.py -> PARITY.md."""
    data, syms = _frame(code, nbytes, rng)
    noisy = syms[0].astype(np.float64)
    noisy += rng.normal(0.0, 18.0, size=noisy.shape)  # ~Eb/N0 well above threshold
    noisy = np.clip(np.rint(noisy), 0, 255).astype(np.uint8)

    ref_out, _ = ref_oracle.decode(family, code.polys, noisy, nbytes * 8)
    ours = np.asarray(
        decode_symbols(code, NUMERIC,
                       jnp.asarray(noisy.astype(np.int32))[None], nbytes * 8))
    np.testing.assert_array_equal(ref_out, data[0])
    np.testing.assert_array_equal(ours[0], ref_out)


@pytest.mark.parametrize("family,code", [("v27", VITERBI27), ("v29", VITERBI29)],
                         ids=["v27", "v29"])
def test_quantized_mode_bit_identical_to_ka9q_under_any_noise(family, code, rng):
    """The ka9q-exact u8 quantized mode (ops/quantized.py) must decode
    BYTE-IDENTICALLY to the compiled reference binaries on arbitrary
    streams -- noiseless through far-beyond-threshold noise, agreeing even
    where both decode incorrectly.  This is the true noisy-operating-point
    bit-exactness claim (the int32 paths are deliberately cleaner than
    ka9q near ties; PARITY.md)."""
    from ka9q_viterbi_comparison_tpu.ops.quantized import decode_symbols_ka9q

    nbytes = 32
    for sigma in (0.0, 32.0, 64.0, 96.0, 128.0, 192.0):
        for _ in range(3):
            data, syms = _frame(code, nbytes, rng)
            noisy = syms[0].astype(np.float64)
            noisy += rng.normal(0.0, sigma, size=noisy.shape)
            noisy = np.clip(np.rint(noisy), 0, 255).astype(np.uint8)

            ref_out, _ = ref_oracle.decode(family, code.polys, noisy,
                                           nbytes * 8)
            ours = np.asarray(decode_symbols_ka9q(
                code, jnp.asarray(noisy)[None], nbytes * 8))
            np.testing.assert_array_equal(
                ours[0], ref_out,
                err_msg=f"{family} sigma={sigma}")


@pytest.mark.parametrize("family,code",
                         [("spiral27", VITERBI27), ("spiral29", VITERBI29)],
                         ids=["spiral27", "spiral29"])
def test_spiral_quantized_mode_bit_identical_under_any_noise(family, code, rng):
    """The SPIRAL-exact u8 saturating mode must decode byte-identically to
    the compiled spiral27/spiral29 binaries on arbitrary streams (incl.
    the per-bit >210 renormalization path, which heavy noise exercises)."""
    from ka9q_viterbi_comparison_tpu.ops.quantized import decode_symbols_spiral

    nbytes = 32
    for sigma in (0.0, 32.0, 64.0, 96.0, 128.0, 192.0):
        for _ in range(3):
            data, syms = _frame(code, nbytes, rng)
            noisy = syms[0].astype(np.float64)
            noisy += rng.normal(0.0, sigma, size=noisy.shape)
            noisy = np.clip(np.rint(noisy), 0, 255).astype(np.uint8)

            ref_out, _ = ref_oracle.decode(family, code.polys, noisy,
                                           nbytes * 8)
            ours = np.asarray(decode_symbols_spiral(
                code, jnp.asarray(noisy)[None], nbytes * 8))
            np.testing.assert_array_equal(
                ours[0], ref_out,
                err_msg=f"{family} sigma={sigma}")
