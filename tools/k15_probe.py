#!/usr/bin/env python
"""K=15 path comparison: VMEM-resident kernel vs large_k layout vs jnp."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu import VITERBI615, soft8_spec  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops import acs, chainback as cb  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames  # noqa: E402
from ka9q_viterbi_comparison_tpu.ops.pallas import kernels as plk, large_k  # noqa: E402
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors  # noqa: E402

LOG = lambda *a: print(*a, flush=True)
code = VITERBI615
numeric = soft8_spec(code.R)
B = 128
NB_BYTES = 256
T = code.transmit_bits(NB_BYTES)


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if isinstance(leaf, jax.Array):
            np.asarray(leaf.ravel()[-1])


def timed(fn, iters=3):
    fetch(fn())
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def marginal(label, make_fn):
    t1 = timed(make_fn(1))
    t3 = timed(make_fn(3))
    marg = (t3 - t1) / 2
    rate = B * T * code.R / marg
    LOG(f"{label:>10}: {marg*1e3:9.2f} ms/call  {rate/1e6:8.2f} Msym/s "
        f"(ref best 5.7M)  [t1={t1*1e3:.0f}ms]")


def main():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(B, NB_BYTES), dtype=np.uint8)
    syms = jax.block_until_ready(
        encode_frames(code, numeric, jnp.asarray(data)).reshape(B, T, code.R))
    m0 = acs.init_metrics(code, numeric, B)

    # correctness of large_k at K=15 on hardware
    m, words, _ = large_k.acs_update_large(code, numeric, m0, syms)
    out = cb.chainback(code, words, NB_BYTES * 8)
    errs = count_bit_errors(np.asarray(out), data)
    LOG(f"large_k K15 decode bit_errors={errs}")

    def make_lg(n):
        @jax.jit
        def run(m, s):
            w = None
            for _ in range(n):
                m, w, _ = large_k.acs_update_large.__wrapped__(code, numeric, m, s, False)
            return m, w
        return lambda: run(m0, syms)

    marginal("large_k", make_lg)

    TBk = plk.pick_time_block(code, B)
    Tp = -(-T // TBk) * TBk
    sym_native = jax.block_until_ready(
        jnp.pad(syms, ((0, 0), (0, Tp - T), (0, 0))).transpose(1, 2, 0))
    m0sb = m0.T

    def make_vmem(n):
        @jax.jit
        def run(m, s):
            w = None
            for _ in range(n):
                m, w = plk.acs_update_tb(code, numeric, m, s, T)
            return m, w
        return lambda: run(m0sb, sym_native)

    marginal("vmem-kern", make_vmem)

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
