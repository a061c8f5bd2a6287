#!/usr/bin/env python
"""K=15 through the restructured VMEM-resident kernel vs large_k2.

Round 1 measured the (then masked, scalar-prefetch) VMEM kernel SLOWER than
jnp for K=15 and routed K>=10 to the HBM-streamed large_k kernels.  The
static-tail restructure changed the calculus for K<=9 (~2x); this probe
re-checks K=15: metrics [16384, B] int32 = 8 MiB at B=128 fit VMEM fine.
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
from ka9q_viterbi_comparison_tpu.ops.pallas import kernels, large_k2

LOG = lambda *a: print(*a, flush=True)
code = VITERBI615
numeric = soft8_spec(code.R)


def marginal(chain, iters=5, n_chain=5):
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


def vmem_case(B, Tp=1024):
    m0 = acs.init_metrics(code, numeric, B).T
    sym = jnp.zeros((Tp, code.R, B), jnp.int32)

    def chain(n):
        @jax.jit
        def run(m, s):
            d = None
            for _ in range(n):
                m, d = kernels.acs_update_tb.__wrapped__(
                    code, numeric, m, s, Tp, False)
            return m, d

        return lambda: run(m0, sym)

    try:
        marg = marginal(chain)
        LOG(f"k15 VMEM kernel B={B}: {B*Tp*code.R/marg/1e6:.1f} Msym/s "
            f"(marg {marg*1e3:.2f} ms)")
    except Exception as e:  # noqa: BLE001
        LOG(f"k15 VMEM kernel B={B}: FAIL {str(e).splitlines()[0][:200]}")


def large2_case(B, T=1024):
    m0 = acs.init_metrics(code, numeric, B)
    sym = jnp.zeros((B, T, code.R), jnp.int32)

    def chain(n):
        @jax.jit
        def run(m, s):
            w = None
            for _ in range(n):
                m, w, _ = large_k2.acs_update_large2.__wrapped__(
                    code, numeric, m, s, False, None)
            return m, w

        return lambda: run(m0, sym)

    marg = marginal(chain)
    LOG(f"k15 large_k2 B={B}: {B*T*code.R/marg/1e6:.1f} Msym/s "
        f"(marg {marg*1e3:.2f} ms)")


if __name__ == "__main__":
    LOG(f"backend: {jax.default_backend()}")
    large2_case(128)
    for b in (64, 128):
        vmem_case(b)
    large2_case(64)
    LOG("ALL DONE")
