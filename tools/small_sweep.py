#!/usr/bin/env python
"""Small-K routing sweep: in-place rotating-address kernel vs the shipped
VMEM kernel, absolute chained times (min-of-k), per (config, batch).

Method: jit programs of 1 and 33 chained whole-frame updates (metrics feed
forward); marginal = (min t33 - min t1) / 32.  Minima over k samples make
the marginal robust to this rig's shared-chip contention; the constant
dispatch/transport overhead cancels in the difference.
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

from ka9q_viterbi_comparison_tpu import (
    VITERBI27, VITERBI29, VITERBI47, VITERBI49, soft8_spec,
)
from ka9q_viterbi_comparison_tpu.ops import acs
from ka9q_viterbi_comparison_tpu.ops.pallas import inplace, kernels

LOG = lambda *a: print(*a, flush=True)
N = 33
REPS = int(os.environ.get("SWEEP_REPS", "9"))
rng = np.random.default_rng(0)


def t_abs(fn):
    t0 = time.perf_counter()
    m, d = fn()
    np.asarray(m[..., -1:])  # host readback = the only reliable sync here
    return time.perf_counter() - t0


def case_inplace(code, B, T=2048):
    numeric = soft8_spec(code.R)
    m0 = acs.init_metrics(code, numeric, B).T
    Tp = inplace.pad_time_inplace(code, T, B)
    sym = jnp.asarray(rng.integers(0, 7, (Tp, code.R, B)), jnp.int32)

    def chain(n):
        @jax.jit
        def run(m, s):
            d = None
            for _ in range(n):
                m, d = inplace.acs_update_inplace.__wrapped__(
                    code, numeric, m, s, Tp, 0, False)
            return m, d
        return lambda: run(m0, sym)

    return chain, B * Tp * code.R, f"inplace {code.name} B={B}"


def case_kernels(code, B, T=2048):
    numeric = soft8_spec(code.R)
    m0 = acs.init_metrics(code, numeric, B).T
    TB = kernels.pick_time_block(code, B)
    Tp = -(-T // TB) * TB
    sym = jnp.asarray(rng.integers(0, 7, (Tp, code.R, B)), jnp.int32)

    def chain(n):
        @jax.jit
        def run(m, s):
            d = None
            for _ in range(n):
                m, d = kernels.acs_update_tb.__wrapped__(
                    code, numeric, m, s, Tp, False)
            return m, d
        return lambda: run(m0, sym)

    return chain, B * Tp * code.R, f"kernels {code.name} B={B}"


CODES = {"27": VITERBI27, "29": VITERBI29, "47": VITERBI47, "49": VITERBI49}

if __name__ == "__main__":
    spec = sys.argv[1:] or ["27:256,512", "29:128,256"]
    cases = []
    t0 = time.time()
    for item in spec:
        cname, bs = item.split(":")
        for B in (int(b) for b in bs.split(",")):
            for mk in (case_inplace, case_kernels):
                chain, units, label = mk(CODES[cname], B)
                c1, cN = chain(1), chain(N)
                t_abs(c1), t_abs(cN)  # compile
                cases.append((c1, cN, units, label))
                LOG(f"  compiled {label} ({time.time()-t0:.0f}s cum)")

    t1s = {label: [] for *_, label in cases}
    tns = {label: [] for *_, label in cases}
    for rep in range(REPS):
        for c1, cN, units, label in cases:
            t1s[label].append(t_abs(c1))
            tns[label].append(t_abs(cN))
    for _, _, units, label in cases:
        marg = (min(tns[label]) - min(t1s[label])) / (N - 1)
        marg = max(marg, 1e-9)
        LOG(f"{label}: {units / marg / 1e9:.2f} Gsym/s "
            f"(marginal {marg*1e3:.3f} ms/call)")
    LOG("ALL DONE")
