#!/usr/bin/env python
"""A/B the chunk-loop unroll factor of the in-place kernel (K=15 focus).

The K=15 step runs 32 independent 512-row chunks through a fori_loop; at
unroll=1 each iteration pays loop bookkeeping plus a drained VPU pipeline
(chunks are data-independent, so unrolling exposes cross-chunk ILP).
KA9Q_TPU_INPLACE_UNROLL is read at trace time.

Usage: python tools/unroll_sweep.py [unrolls ...] (default 1 2 4 8)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu import VITERBI615, soft8_spec
from ka9q_viterbi_comparison_tpu.ops import acs
from ka9q_viterbi_comparison_tpu.ops.pallas import inplace

LOG = lambda *a: print(*a, flush=True)
N = 17
REPS = int(os.environ.get("SWEEP_REPS", "9"))
rng = np.random.default_rng(0)
code = VITERBI615
B, T = 256, 1024


def t_abs(fn):
    t0 = time.perf_counter()
    m, d = fn()
    np.asarray(m[..., -1:])  # host readback sync
    return time.perf_counter() - t0


def case(unroll):
    numeric = soft8_spec(code.R)
    m0 = acs.init_metrics(code, numeric, B).T
    Tp = inplace.pad_time_inplace(code, T, B)
    sym = jnp.asarray(rng.integers(0, 7, (Tp, code.R, B)), jnp.int32)
    os.environ["KA9Q_TPU_INPLACE_UNROLL"] = str(unroll)

    def chain(n):
        def one(m, s):
            return inplace.acs_update_inplace.__wrapped__(
                code, numeric, m, s, Tp, 0, False)

        @jax.jit
        def run(m, s):
            def body(_, carry):
                m, _ = carry
                return one(m, s)

            # fori_loop keeps compile time n-independent (kernel traced twice).
            return jax.lax.fori_loop(0, n - 1, body, one(m, s))

        return lambda: run(m0, sym)

    c1, cN = chain(1), chain(N)
    t_abs(c1), t_abs(cN)  # trace+compile now, while the env var holds
    return c1, cN, B * Tp * code.R, f"unroll={unroll}"


if __name__ == "__main__":
    unrolls = [int(u) for u in (sys.argv[1:] or ["1", "2", "4", "8"])]
    cases = []
    t0 = time.time()
    for u in unrolls:
        cases.append(case(u))
        LOG(f"  compiled unroll={u} ({time.time()-t0:.0f}s cum)")

    t1s = {lab: [] for *_, lab in cases}
    tns = {lab: [] for *_, lab in cases}
    for rep in range(REPS):
        for c1, cN, units, lab in cases:
            t1s[lab].append(t_abs(c1))
            tns[lab].append(t_abs(cN))
    for _, _, units, lab in cases:
        marg = max((min(tns[lab]) - min(t1s[lab])) / (N - 1), 1e-9)
        LOG(f"{lab}: {units / marg / 1e6:.2f} Msym/s "
            f"(marginal {marg*1e3:.3f} ms/call)")
    LOG("ALL DONE")
