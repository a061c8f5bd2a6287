#!/usr/bin/env python
"""Measured decision agreement vs the REFERENCE binaries (PARITY.md data).

For each shared family and a sweep of AWGN operating points, decodes the
same u8 offset-binary symbol streams through (a) the reference's compiled
decoders (tools/ref_oracle.py shim) and (b) this framework's int32-exact
path, and measures:

* each stack's BER vs the transmitted data;
* the fraction of decoded bits where the two stacks AGREE (where ka9q's
  u8 avg/shift metric compression or SPIRAL's u8-saturating arithmetic
  may legitimately diverge from int32-exact arithmetic near ties).

Writes data/parity_agreement.json and prints the PARITY.md table.

Run: python tools/parity_probe.py [frames_per_point]
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # scalar frames; CPU is fine
import jax.numpy as jnp

from ka9q_viterbi_comparison_tpu.configs import (
    VITERBI27, VITERBI29, VITERBI47, VITERBI49, VITERBI615, VITERBI224,
    ka9q_offset_binary_spec)
from ka9q_viterbi_comparison_tpu.models.functional import decode_symbols
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops.quantized import (
    decode_symbols_ka9q, decode_symbols_spiral)

import ref_oracle

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 64

# family -> (code, frame bytes, endstate fn, frame-count divisor: the
# 2^23-state K=24 CPU decode dominates wall time, so it runs fewer frames)
CASES = {
    "v27": (VITERBI27, 32, None, 1),
    "v29": (VITERBI29, 32, None, 1),
    "v615_fixed": (VITERBI615, 8, None, 1),
    "spiral27": (VITERBI27, 32, None, 1),
    "spiral29": (VITERBI29, 32, None, 1),
    "spiral47": (VITERBI47, 32, None, 1),
    "spiral49": (VITERBI49, 32, None, 1),
    "spiral615": (VITERBI615, 8, None, 1),
    "v224": (VITERBI224, 8, ref_oracle.v224_true_endstate, 8),
}

# the quantized-exact modes: agreement must be 1.0 at EVERY operating
# point (they replicate the reference's u8 arithmetic bit-for-bit)
QUANTIZED_CASES = {
    "v27+quantized": (VITERBI27, 32, decode_symbols_ka9q),
    "v29+quantized": (VITERBI29, 32, decode_symbols_ka9q),
    "spiral27+quantized": (VITERBI27, 32, decode_symbols_spiral),
    "spiral29+quantized": (VITERBI29, 32, decode_symbols_spiral),
}

NUMERIC = ka9q_offset_binary_spec()
A = 127.5  # bipolar amplitude of the {0,255} rails


def ebn0_db(sigma: float, R: int) -> float:
    # Eb = R * A^2 (R rail symbols per trellis bit), N0 = 2 sigma^2.
    if sigma == 0.0:
        return float("inf")
    return 10 * np.log10(R * A * A / (2 * sigma * sigma))


def run_case(family, code, nbytes, es_fn, sigma, rng, n_frames,
             decode_fn=None):
    data = rng.integers(0, 256, size=(n_frames, nbytes), dtype=np.uint8)
    clean = np.asarray(
        encode_frames(code, NUMERIC, jnp.asarray(data))).astype(np.float64)
    noisy = clean + rng.normal(0.0, sigma, size=clean.shape)
    noisy = np.clip(np.rint(noisy), 0, 255).astype(np.uint8)

    if decode_fn is not None:  # quantized-exact modes (ops/quantized.py)
        ours = np.asarray(decode_fn(code, jnp.asarray(noisy), nbytes * 8))
    else:
        ours = np.asarray(decode_symbols(
            code, NUMERIC, jnp.asarray(noisy.astype(np.int32)), nbytes * 8))

    ref = np.zeros_like(data)
    for i in range(n_frames):
        es = es_fn(data[i]) if es_fn else 0
        ref[i], _ = ref_oracle.decode(
            family, code.polys, noisy[i], nbytes * 8, es)

    bits = nbytes * 8 * n_frames
    pop = np.unpackbits
    ber_ref = np.count_nonzero(pop(ref ^ data)) / bits
    ber_ours = np.count_nonzero(pop(ours ^ data)) / bits
    agree = 1.0 - np.count_nonzero(pop(ours ^ ref)) / bits
    ident = float(np.mean(np.all(ours == ref, axis=1)))
    e = ebn0_db(sigma, code.R)
    return dict(sigma=sigma, ebn0_db=None if np.isinf(e) else round(e, 2),
                ber_ref=ber_ref, ber_ours=ber_ours,
                bit_agreement=agree, frames_identical=ident)


def main():
    rng = np.random.default_rng(20260820)
    out = {"n_frames": N_FRAMES, "families": {}}
    for family, (code, nbytes, es_fn, div) in CASES.items():
        rows = []
        for sigma in (0.0, 32.0, 64.0, 96.0, 128.0):
            r = run_case(family, code, nbytes, es_fn, sigma, rng,
                         max(4, N_FRAMES // div))
            rows.append(r)
            eb = float("inf") if r["ebn0_db"] is None else r["ebn0_db"]
            print(f"{family:12s} sigma={sigma:5.1f} Eb/N0={eb:6.2f} dB "
                  f"BER ref={r['ber_ref']:.4f} ours={r['ber_ours']:.4f} "
                  f"agree={r['bit_agreement']:.5f} ident={r['frames_identical']:.3f}",
                  flush=True)
        out["families"][family] = rows
    for label, (code, nbytes, fn) in QUANTIZED_CASES.items():
        family = label.split("+")[0]
        rows = []
        for sigma in (0.0, 64.0, 128.0, 192.0):
            r = run_case(family, code, nbytes, None, sigma, rng,
                         max(4, N_FRAMES), decode_fn=fn)
            rows.append(r)
            assert r["bit_agreement"] == 1.0, (label, sigma, r)
            print(f"{label:20s} sigma={sigma:5.1f} agree={r['bit_agreement']:.5f} "
                  f"ident={r['frames_identical']:.3f}", flush=True)
        out["families"][label] = rows
    path = pathlib.Path(__file__).resolve().parent.parent / "data" / "parity_agreement.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
