#!/usr/bin/env python
"""Sweep update-phase throughput over batch sizes for one config
(marginal chained timing)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    p = argparse.ArgumentParser("batch_sweep")
    p.add_argument("--code", default="viterbi29")
    p.add_argument("--batches", type=int, nargs="+", default=[256, 512, 1024])
    p.add_argument("--bytes", type=int, default=0)
    p.add_argument("--backend", default="pallas")
    args = p.parse_args()

    from ka9q_viterbi_comparison_tpu import BENCH_FRAME_BYTES, STANDARD_CODES, soft8_spec
    from ka9q_viterbi_comparison_tpu.harness.bench import time_update_marginal
    from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames

    code = {c.name: c for c in STANDARD_CODES}[args.code]
    numeric = soft8_spec(code.R)
    n_bytes = args.bytes or BENCH_FRAME_BYTES[code.name]
    for B in args.batches:
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
        syms = jax.block_until_ready(
            encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R))
        rate = time_update_marginal(code, numeric, syms, backend=args.backend,
                                    n_chain=3, iters=3)
        print(f"{code.name} B={B}: {rate/1e6:,.1f} Msym/s", flush=True)


if __name__ == "__main__":
    main()
