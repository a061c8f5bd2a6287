#!/usr/bin/env python
"""Sweep the in-kernel time-loop unroll factor for the small-K ACS kernel.

Penalty construction for step t+1 depends only on the symbol stream, not on
the loop-carried metrics, so unrolling the fori_loop gives Mosaic a window
to software-pipeline the next step's penalties against the current step's
ACS chain.  This probe measures whether that materialises on hardware.
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

from ka9q_viterbi_comparison_tpu import VITERBI27, VITERBI29, soft8_spec
from ka9q_viterbi_comparison_tpu.ops import acs
from ka9q_viterbi_comparison_tpu.ops.pallas import kernels

LOG = lambda *a: print(*a, flush=True)


def marginal(chain, iters=7, n_chain=9):
    c1, cN = chain(1), chain(n_chain)

    def timed(fn):
        t0 = time.perf_counter()
        r = fn()
        np.asarray(r[0][-1, -1])
        return time.perf_counter() - t0

    t0 = time.time()
    jax.block_until_ready(c1())
    jax.block_until_ready(cN())
    LOG(f"  compiled in {time.time()-t0:.0f}s")
    margs = []
    for _ in range(iters):
        t1 = min(timed(c1), timed(c1))
        tn = timed(cN)
        margs.append(max((tn - t1) / (n_chain - 1), 1e-9))
    return float(np.median(margs))


def case(code, B, unroll, Tp=2048):
    numeric = soft8_spec(code.R)
    m0 = acs.init_metrics(code, numeric, B).T
    sym = jnp.zeros((Tp, code.R, B), jnp.int32)

    def chain(n):
        @jax.jit
        def run(m, s):
            d = None
            for _ in range(n):
                m, d = kernels.acs_update_tb.__wrapped__(
                    code, numeric, m, s, Tp, False, unroll)
            return m, d

        return lambda: run(m0, sym)

    try:
        marg = marginal(chain)
        LOG(f"K={code.K} B={B} unroll={unroll}: "
            f"{B*Tp*code.R/marg/1e9:.2f} Gsym/s (marg {marg*1e3:.2f} ms)")
    except Exception as e:  # noqa: BLE001
        LOG(f"K={code.K} B={B} unroll={unroll}: FAIL "
            f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    LOG(f"backend: {jax.default_backend()}")
    for u in (1, 2, 4, 8):
        case(VITERBI27, 256, u)
    for u in (1, 2, 4):
        case(VITERBI29, 128, u)
    LOG("ALL DONE")
