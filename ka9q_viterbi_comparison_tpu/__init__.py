"""ka9q_viterbi_comparison_tpu: a TPU-native soft-decision Viterbi decoding
framework.

A from-scratch JAX / Pallas re-design of the capability set of
williamyang98/ka9q_viterbi_comparison (a C++/SSE2 benchmark harness for
ka9q-libfec, SPIRAL and ViterbiDecoderCpp convolutional decoders): the same
code configurations (K=7/9 rate 1/2 & 1/4, K=15 rate 1/6 "Cassini", K=24 rate
1/2 "ICE"), the same reset/update/chainback decoder lifecycle and per-phase
benchmark methodology, and a byte-compatible results-JSON schema -- but built
for TPUs: batched frames on vector lanes, `lax.scan`/Pallas trellis kernels,
branch metrics on the MXU, and multi-chip scaling (frame DP, time-block SP,
state sharding for K=24) over a `jax.sharding.Mesh`.
"""

from .configs import (
    BENCH_FRAME_BYTES,
    STANDARD_CODES,
    VITERBI27,
    VITERBI29,
    VITERBI47,
    VITERBI49,
    VITERBI224,
    VITERBI615,
    CodeSpec,
    NumericSpec,
    hard8_spec,
    ka9q_offset_binary_spec,
    soft8_spec,
    soft16_spec,
)
from .models.decoder import ViterbiDecoder, decode_frames
from .models.functional import decode_fn, decode_symbols
from .models.streaming import StreamingDecoder

__version__ = "0.1.0"

__all__ = [
    "CodeSpec",
    "NumericSpec",
    "ViterbiDecoder",
    "StreamingDecoder",
    "decode_frames",
    "decode_fn",
    "decode_symbols",
    "VITERBI27",
    "VITERBI47",
    "VITERBI29",
    "VITERBI49",
    "VITERBI615",
    "VITERBI224",
    "STANDARD_CODES",
    "BENCH_FRAME_BYTES",
    "ka9q_offset_binary_spec",
    "soft16_spec",
    "soft8_spec",
    "hard8_spec",
    "__version__",
]
