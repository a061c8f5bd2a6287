#!/usr/bin/env python
"""Consolidated TPU evaluation: timing-honesty probe, full benchmark matrix,
K=24 decode check.  Run as one long background process so Mosaic/XLA compiles
happen sequentially without contention; enables the persistent compilation
cache so later runs skip them."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu import (  # noqa: E402
    VITERBI224, VITERBI27, soft8_spec,
)
from ka9q_viterbi_comparison_tpu.models.functional import decode_symbols  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.pallas import dispatch  # noqa: E402
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors  # noqa: E402

LOG = lambda *a: print(*a, flush=True)


def probe_timing_honesty():
    """Compare block_until_ready timing vs fetching a slice of the output to
    host (which cannot complete before the kernel does)."""
    code, numeric = VITERBI27, soft8_spec(2)
    B = 4096
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(B, 1024), dtype=np.uint8)
    syms = jax.block_until_ready(
        encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, 2))
    init_fn, update_fn, _, prepare_fn, _, _ = dispatch.phase_fns(code, numeric, 1024 * 8)
    prepared = prepare_fn(syms)
    m = init_fn(B)
    r = update_fn(m, prepared)
    jax.tree.map(jax.block_until_ready, r)
    n_sym = B * syms.shape[1] * 2

    t0 = time.perf_counter()
    for _ in range(5):
        jax.tree.map(jax.block_until_ready, update_fn(m, prepared))
    ta = (time.perf_counter() - t0) / 5

    t0 = time.perf_counter()
    for _ in range(5):
        _, (dec, _, _), _ = update_fn(m, prepared)
        np.asarray(dec[-1, -1, -8:])  # host fetch forces kernel completion
    tb = (time.perf_counter() - t0) / 5
    LOG(f"PROBE block_until_ready: {ta*1e3:.2f} ms ({n_sym/ta/1e9:.1f} Gsym/s)")
    LOG(f"PROBE slice-to-host:     {tb*1e3:.2f} ms ({n_sym/tb/1e9:.1f} Gsym/s)")


def k24_check():
    code, nb, B = VITERBI224, 8, 2
    numeric = soft8_spec(code.R)
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=(B, nb), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data))
    t0 = time.time()
    out = jax.block_until_ready(decode_symbols(code, numeric, syms, nb * 8))
    LOG(f"K24 compile+run: {time.time()-t0:.1f}s errors:"
        f" {count_bit_errors(np.asarray(out), data)}")
    t0 = time.time()
    out = jax.block_until_ready(decode_symbols(code, numeric, syms, nb * 8))
    np.asarray(out)
    dt = time.time() - t0
    T = code.transmit_bits(nb)
    LOG(f"K24 decode: {dt:.3f}s -> {B*T*code.R/dt/1e3:.1f} ksym/s (ref best 2.82k)")


def full_matrix(out_path="data/benchmark.json", t=0.3, n=4):
    from ka9q_viterbi_comparison_tpu.harness.runner import main as runner_main

    runner_main(["-t", str(t), "-n", str(n), "-o", out_path])
    data = json.load(open(out_path))
    LOG(f"MATRIX: wrote {out_path} with {len(data)} tests")
    for rec in data:
        upd = np.asarray(rec["update_ns"], float)
        rate = rec["total_output_symbols"] / (np.median(upd) * 1e-9)
        LOG(f"  {rec['name']:>12} K={rec['K']:>2} R={rec['R']} "
            f"update {rate/1e6:,.1f} Msym/s  BER {rec['bit_error_rate']:.3f}")
    # Noiseless channel + tail termination: any nonzero BER on hardware is a
    # kernel bug (the reference's own invariant, src/main.cpp:110-115).
    bad = [r["name"] for r in data if r["bit_error_rate"] != 0]
    assert not bad, f"nonzero BER on hardware for: {bad}"
    LOG("MATRIX: all configs bit-exact on hardware (BER=0)")


if __name__ == "__main__":
    stages = sys.argv[1:] or ["probe", "matrix", "k24"]
    for s in stages:
        LOG(f"=== stage {s} @ {time.strftime('%H:%M:%S')}")
        if s == "probe":
            probe_timing_honesty()
        elif s == "matrix":
            full_matrix()
        elif s == "k24":
            k24_check()
    LOG("ALL DONE")
