#!/usr/bin/env python
"""Marginal-timed (in-jit chained) profile of radix repack formulations.

Each stage is chained k times inside one jit (output feeds back into the
next iteration's input so XLA cannot CSE/dead-code links); the marginal
cost per application is (t_hi - t_lo) / (k_hi - k_lo) -- the tunneled
transport's per-call constant cancels.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ka9q_viterbi_comparison_tpu.configs import VITERBI224
from ka9q_viterbi_comparison_tpu.harness.bench import sync
from ka9q_viterbi_comparison_tpu.ops import radix

B, T = 4, 87
code = VITERBI224
n = code.K - 1
S = code.num_states
W = S // 32
rng = np.random.default_rng(0)
words = jnp.asarray(rng.integers(0, 2**32, size=(B, T, W), dtype=np.uint32))


def marginal_chain(body, k_lo=1, k_hi=5, reps=3):
    """body(words)->scalar-ish feedback array; chain via xor into words."""

    def make(k):
        @jax.jit
        def run(wds):
            def it(_, w_):
                fb = body(w_)
                return w_ ^ fb.astype(jnp.uint32)

            return jax.lax.fori_loop(0, k, it, wds)

        return run

    c_lo, c_hi = make(k_lo), make(k_hi)
    sync(c_lo(words)); sync(c_hi(words))
    t_lo = t_hi = None
    for _ in range(reps):
        t0 = time.perf_counter(); sync(c_lo(words)); a = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(c_hi(words)); b = time.perf_counter() - t0
        t_lo = a if t_lo is None else min(t_lo, a)
        t_hi = b if t_hi is None else min(t_hi, b)
    return (t_hi - t_lo) / (k_hi - k_lo)


def build_vectorized(wds, w=8):
    """Ladder with windows fully vectorized (no lax.map)."""
    n2 = T // 2
    pairs = wds[:, : 2 * n2].reshape(B, n2, 2, -1)
    hi = radix._unpack_bits(pairs[:, :, 1], n)
    lo = radix._unpack_bits(pairs[:, :, 0], n)
    cur = radix._combine(lo, hi, 1, n)
    width = 2
    tabs = {2: cur}
    while width < w:
        nw = cur.shape[1] // 2
        cur = radix._combine(cur[:, 0 : 2 * nw : 2], cur[:, 1 : 2 * nw : 2],
                             width, n)
        width *= 2
        tabs[width] = cur
    return tabs


def main():
    # shipped ladder (lax.map per window)
    m = marginal_chain(lambda w_: radix.build_radix_tables(code, w_)[8][0, 0, :1],
                       1, 3)
    print(f"shipped build (map)   : {m*1e3:9.1f} ms", flush=True)

    # vectorized ladder
    m = marginal_chain(lambda w_: build_vectorized(w_)[8][0, 0, :1], 1, 3)
    print(f"vectorized ladder     : {m*1e3:9.1f} ms", flush=True)

    # single stages, vectorized across all windows
    def stage_unpack(w_):
        bits = radix._unpack_bits(w_.reshape(B, T, -1), n)
        return bits[0, 0, :1]

    m = marginal_chain(stage_unpack, 1, 5)
    print(f"unpack all {T} rows    : {m*1e3:9.1f} ms", flush=True)

    def stage_l1(w_):
        n2 = T // 2
        pairs = w_[:, : 2 * n2].reshape(B, n2, 2, -1)
        hi = radix._unpack_bits(pairs[:, :, 1], n)
        lo = radix._unpack_bits(pairs[:, :, 0], n)
        return radix._combine(lo, hi, 1, n)[0, 0, :1]

    m = marginal_chain(stage_l1, 1, 3)
    print(f"L1 (43 wins, fused)   : {m*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
