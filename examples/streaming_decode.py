#!/usr/bin/env python
"""Example: continuous streaming decode with bounded latency and a mid-stream
checkpoint/restore (the decoder state is a plain pytree)."""

import jax.numpy as jnp
import numpy as np

from ka9q_viterbi_comparison_tpu import VITERBI27, soft8_spec
from ka9q_viterbi_comparison_tpu.models.streaming import StreamingDecoder
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.utils.bits import bits_to_bytes


def main() -> None:
    code, numeric = VITERBI27, soft8_spec(2)
    n_bytes = 512
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(1, n_bytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))

    dec = StreamingDecoder(code, numeric, batch=1, traceback_depth=64)
    out_bits = []
    chunk = 100 * code.R
    for i in range(0, syms.shape[1], chunk):
        released = dec.push(syms[:, i : i + chunk])
        out_bits.append(released)
        if i == chunk * 3:  # demonstrate checkpoint/resume mid-stream
            state = dec.checkpoint()
            dec = StreamingDecoder(code, numeric, batch=1, traceback_depth=64)
            dec.restore(state)
    out_bits.append(dec.flush(endstate=0))

    bits = jnp.concatenate(out_bits, axis=1)[:, : n_bytes * 8]
    ok = bool((np.asarray(bits_to_bytes(bits)) == data).all())
    print(f"streamed {syms.shape[1]} symbols in {chunk}-symbol chunks; "
          f"decoded correctly: {ok}")


if __name__ == "__main__":
    main()
