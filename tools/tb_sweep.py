#!/usr/bin/env python
"""Time-block sweep for the restructured small-K kernel, contention-controlled.

Runs the production kernel (kernels.acs_update_tb) at several time-block
sizes AND the standalone single-launch probe kernel from narrow_probe2 in the
SAME process, so relative numbers are comparable under whatever chip
contention exists right now.
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


def marginal(fn1, fnN, n_chain, args, iters=5):
    def timed(fn):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r[0][-1, -1])
        return time.perf_counter() - t0

    jax.block_until_ready(fn1(*args))
    jax.block_until_ready(fnN(*args))
    margs = []
    for _ in range(iters):
        t1 = min(timed(fn1), timed(fn1))
        tn = timed(fnN)
        margs.append(max((tn - t1) / (n_chain - 1), 1e-9))
    return float(np.median(margs))


def sweep(code, B, Tp, tbs, n_chain=5):
    numeric = soft8_spec(code.R)
    m0 = acs.init_metrics(code, numeric, B).T
    sym = jnp.zeros((Tp, code.R, B), jnp.int32)
    orig = kernels.pick_time_block
    for tb in tbs:
        kernels.pick_time_block = lambda c, b, v=None, _tb=tb: _tb
        try:
            def chain(n):
                @jax.jit
                def run(m, sym):
                    d = None
                    for _ in range(n):
                        m, d = kernels.acs_update_tb.__wrapped__(
                            code, numeric, m, sym, Tp, False)
                    return m, d
                return run

            t0 = time.time()
            c1, cN = chain(1), chain(n_chain)
            marg = marginal(c1, cN, n_chain, (m0, sym))
            rate = B * Tp * code.R / marg
            LOG(f"{code.name} B={B} TB={tb}: {rate/1e9:.2f} Gsym/s "
                f"(marg {marg*1e3:.2f} ms, total {time.time()-t0:.0f}s)")
        except Exception as e:  # noqa: BLE001
            LOG(f"{code.name} B={B} TB={tb}: FAIL {str(e).splitlines()[0][:160]}")
        finally:
            kernels.pick_time_block = orig


if __name__ == "__main__":
    LOG(f"backend: {jax.default_backend()}")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import narrow_probe2

    stage = sys.argv[1] if len(sys.argv) > 1 else "1"
    if stage == "1":
        # In-process contention reference: the single-launch probe kernel.
        narrow_probe2.acs_probe("i32_base")
        sweep(VITERBI27, 512, 2048, [256, 512, 1024, 2048])
        sweep(VITERBI29, 512, 1024, [96, 256, 512])
        narrow_probe2.acs_probe("i32_base")
    elif stage == "2":
        narrow_probe2.acs_probe("i32_base")
        sweep(VITERBI29, 512, 2304, [96, 128, 192, 256])
        sweep(VITERBI27, 512, 3840, [192, 256, 320])
        # Batch sweep at the chosen block
        for b in (256, 512, 768, 1024):
            sweep(VITERBI27, b, 2048, [256])
    elif stage == "4":
        # K=9-family batch sweep at each batch's production time block.
        from ka9q_viterbi_comparison_tpu import VITERBI49
        for b, tb, tp in ((128, 256, 1024), (256, 192, 1152), (512, 96, 1152)):
            sweep(VITERBI29, b, tp, [tb])
            sweep(VITERBI49, b, tp, [tb])
    elif stage == "3":
        from ka9q_viterbi_comparison_tpu import VITERBI47, VITERBI49
        for b in (128, 256, 384):
            sweep(VITERBI27, b, 2048, [256])
        for b in (128, 256, 512):
            sweep(VITERBI47, b, 2048, [256])
            sweep(VITERBI29, b, 1024, [96])
            sweep(VITERBI49, b, 1024, [96])
    LOG("ALL DONE")
