#!/usr/bin/env python
"""HW probe: in-place rotating-address kernel vs the shipped kernels.

Compares the K=15 update through ops.pallas.inplace (VMEM-resident metrics,
zero interleave) against large_k2 (HBM-streamed, depth-2 fused), and the
small-K configs against kernels.acs_update_tb.  Also times the rotated
chainback.  Variants are interleaved within each iteration so shared-chip
contention hits all alike; reported per-variant as median of marginals.
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

from ka9q_viterbi_comparison_tpu import VITERBI27, VITERBI29, VITERBI615, soft8_spec
from ka9q_viterbi_comparison_tpu.ops import acs
from ka9q_viterbi_comparison_tpu.ops.pallas import inplace, kernels, large_k2

LOG = lambda *a: print(*a, flush=True)


def make_marginal(chain, n_chain=9):
    c1, cN = chain(1), chain(n_chain)

    def timed(fn):
        t0 = time.perf_counter()
        r = fn()
        np.asarray(jax.tree.leaves(r)[0])[..., -1, -1] if hasattr(r, "__len__") else None
        jax.block_until_ready(r)
        return time.perf_counter() - t0

    jax.block_until_ready(c1())
    jax.block_until_ready(cN())

    def sample():
        t1 = min(timed(c1), timed(c1))
        tn = min(timed(cN), timed(cN))
        return max((tn - t1) / (n_chain - 1), 1e-9)

    return sample


def inplace_update_case(code, B, Tp, n_chain=9):
    numeric = soft8_spec(code.R)
    m0 = acs.init_metrics(code, numeric, B).T
    Tp = inplace.pad_time_inplace(code, Tp, B)
    sym = jnp.zeros((Tp, code.R, B), jnp.int32)

    def chain(n):
        @jax.jit
        def run(m, s):
            d = None
            for _ in range(n):
                m, d = inplace.acs_update_inplace.__wrapped__(
                    code, numeric, m, s, Tp, 0, False)
            return m, d

        return lambda: run(m0, sym)

    return (make_marginal(chain, n_chain), B * Tp * code.R,
            f"inplace K={code.K} B={B} Tp={Tp}")


def kernels_update_case(code, B, Tp, n_chain=9):
    numeric = soft8_spec(code.R)
    m0 = acs.init_metrics(code, numeric, B).T
    TB = kernels.pick_time_block(code, B)
    Tp = -(-Tp // TB) * TB
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

    return (make_marginal(chain, n_chain), B * Tp * code.R,
            f"kernels K={code.K} B={B} Tp={Tp}")


def large2_update_case(code, B, T):
    numeric = soft8_spec(code.R)
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

    return make_marginal(chain), B * T * code.R, f"large_k2 K={code.K} B={B} T={T}"


def cb_case(code, B, Tp, n_chain=65):
    """Rotated chainback marginal (in-jit chain of dependent walks)."""
    numeric = soft8_spec(code.R)
    Tp = inplace.pad_time_inplace(code, Tp, B)
    m0 = acs.init_metrics(code, numeric, B).T
    sym = jnp.zeros((Tp, code.R, B), jnp.int32)
    _, dec = jax.block_until_ready(
        inplace.acs_update_inplace(code, numeric, m0, sym, Tp, 0, False))

    def chain(n):
        @jax.jit
        def run(d):
            end0 = jnp.zeros((1, d.shape[2]), jnp.int32)
            out0 = inplace.chainback_inplace.__wrapped__(code, d, end0, Tp, False)

            def body(_, carry):
                es, prev = carry
                out = inplace.chainback_inplace.__wrapped__(
                    code, d, es.reshape(1, -1).astype(jnp.int32) & (code.num_states - 1),
                    Tp, False)
                return out[0].astype(jnp.int32), out

            _, out = jax.lax.fori_loop(
                0, n - 1, body, (out0[0].astype(jnp.int32), out0))
            return out

        return lambda: run(dec)

    return make_marginal(chain, n_chain), B * Tp, f"inplace-cb K={code.K} B={B} Tp={Tp}"


CASE_SETS = {
    "k15": lambda: [
        inplace_update_case(VITERBI615, 128, 2048),
        large2_update_case(VITERBI615, 128, 2048),
    ],
    "k15b": lambda: [
        inplace_update_case(VITERBI615, 64, 2048),
        inplace_update_case(VITERBI615, 256, 2048),
    ],
    "small": lambda: [
        inplace_update_case(VITERBI27, 256, 2048, 33),
        kernels_update_case(VITERBI27, 256, 2048, 33),
        inplace_update_case(VITERBI29, 128, 2048, 33),
        kernels_update_case(VITERBI29, 128, 2048, 33),
    ],
    "cb": lambda: [cb_case(VITERBI615, 128, 2048)],
}

if __name__ == "__main__":
    LOG(f"backend: {jax.default_backend()}")
    cases = []
    for name in sys.argv[1:] or ["k15"]:
        t0 = time.time()
        for c in CASE_SETS[name]():
            cases.append(c)
            LOG(f"  compiled {c[2]} ({time.time()-t0:.0f}s cum)")
    samples = {label: [] for _, _, label in cases}
    for it in range(15):
        for sample, units, label in cases:
            samples[label].append(units / sample())
    for _, units, label in cases:
        v = np.array(samples[label])
        scale, unit = (1e9, "G") if v.max() > 2e9 else (1e6, "M")
        LOG(f"{label}: med {np.median(v)/scale:.2f} best {v.max()/scale:.2f} {unit}/s")
    LOG("ALL DONE")
