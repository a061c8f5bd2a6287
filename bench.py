"""Headline benchmark: K=7 rate-1/2 symbol-update throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Mirrors the reference's hot metric -- symbol-update rate for the viterbi27
config over 1024-byte frames (ref: src/main.cpp:363-372; rate definition
scripts/tabulate_data.py:33).  Baseline to beat: 553 Msym/s, the reference's
best single-core SIMD figure (BASELINE.md, AMD 7735HS sse-u8).

The TPU replaces SIMD lanes with a batch axis: B independent frames decode in
one fused scan, so per-chip throughput is B frames x T steps x R symbols over
the wall time of the update phase (symbols pre-staged on device, output
fetched via block_until_ready -- the analogue of the reference timing only
the update call, src/main.cpp:264-278).
"""

from __future__ import annotations

import argparse
import json
import os

# Persistent compilation cache: Mosaic compiles through this rig's remote
# helper take minutes; cached reruns take seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np

BASELINE_SYM_PER_S = 553e6  # BASELINE.md: best reference update rate, K=7 R=2


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=0, help="frames per decode (0 = auto)")
    p.add_argument("--bytes", type=int, default=1024, help="data bytes per frame")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--backend", default="auto", choices=["auto", "jnp", "pallas"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ka9q_viterbi_comparison_tpu import VITERBI27, soft8_spec
    from ka9q_viterbi_comparison_tpu.harness.bench import time_update_marginal
    from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    # Measured sweet spot on v5e with the in-place rotating-address kernel
    # (chained marginals, tools/small_sweep.py): K=7 peaks at batch 512
    # (10.25 Gsym/s under moderate shared-chip contention; 4.4 G at 256,
    # 5.0 G at 1024).
    B = args.batch or (512 if on_tpu else 8)
    n_bytes = args.bytes if on_tpu else min(args.bytes, 64)
    backend = args.backend
    if backend == "auto":
        backend = "pallas" if on_tpu else "jnp"

    code, numeric = VITERBI27, soft8_spec(code_R := 2)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    symbols = jax.block_until_ready(encode_frames(code, numeric, jnp.asarray(data)))

    # Marginal chained timing: reports true device throughput; per-call
    # dispatch overhead (milliseconds on tunneled transports) cancels.
    sym_per_s = time_update_marginal(
        code, numeric, symbols.reshape(B, -1, code.R), backend=backend,
        # 129-call fori_loop chains put the marginal signal (~105 ms at
        # 10 Gsym/s) an order of magnitude above this rig's shared-chip
        # contention spikes (10-50 ms); shorter chains underreport by
        # whatever the contention level happens to be.
        n_chain=129, iters=max(args.iters, 7),
    )
    print(
        json.dumps(
            {
                "metric": "viterbi27_update_throughput",
                "value": round(sym_per_s / 1e6, 3),
                "unit": "Msym/s",
                "vs_baseline": round(sym_per_s / BASELINE_SYM_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
