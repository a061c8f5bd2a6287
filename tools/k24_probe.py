#!/usr/bin/env python
"""Marginal timing of the K=24 update paths (large_k kernel vs jnp fused)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu import VITERBI224, soft8_spec  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops import acs, chainback as cb  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k  # noqa: E402
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors  # noqa: E402

LOG = lambda *a: print(*a, flush=True)
code = VITERBI224
numeric = soft8_spec(2)
B = 4
NB_BYTES = 8
T = code.transmit_bits(NB_BYTES)


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if isinstance(leaf, jax.Array):
            np.asarray(leaf.ravel()[-1])


def timed(fn, *args, iters=3):
    fetch(fn(*args))
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def marginal(label, make_fn):
    t1 = timed(make_fn(1))
    t3 = timed(make_fn(3))
    marg = (t3 - t1) / 2
    rate = B * T * code.R / marg
    LOG(f"{label:>10}: {marg*1e3:9.2f} ms/call  {marg/T*1e3:7.3f} ms/step  "
        f"{rate/1e3:8.2f} ksym/s (ref best 2.82k)  [t1={t1*1e3:.0f}ms]")


def main():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(B, NB_BYTES), dtype=np.uint8)
    syms = jax.block_until_ready(
        encode_frames(code, numeric, jnp.asarray(data)).reshape(B, T, 2))
    m0 = acs.init_metrics(code, numeric, B)

    # Correctness on hardware first.
    m, words, _ = large_k.acs_update_large(code, numeric, m0, syms)
    out = cb.chainback(code, words, NB_BYTES * 8)
    errs = count_bit_errors(np.asarray(out), data)
    LOG(f"large_k decode bit_errors={errs}")
    assert errs == 0

    def make_lg(n):
        @jax.jit
        def run(m, s):
            w = None
            for _ in range(n):
                m, w, _ = large_k.acs_update_large.__wrapped__(code, numeric, m, s, False)
            return m, w
        return lambda: run(m0, syms)

    marginal("large_k", make_lg)

    def make_jnp(n):
        @jax.jit
        def run(m, s):
            w = None
            for _ in range(n):
                m, w, _ = acs.acs_update(code, numeric, m, s, True)
            return m, w
        return lambda: run(m0, syms)

    marginal("jnp-fused", make_jnp)


if __name__ == "__main__":
    main()
