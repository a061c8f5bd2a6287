#!/usr/bin/env python
"""HW probe: K=24 update via the depth-2 pair kernel vs the depth-4 quad.

Times steady-state scan marginals of ``large_k2.acs_update_large2`` vs
``large_k4.acs_update_large4`` at the benchmark shapes (int16 storage,
time-major words -- the routed configuration), and cross-checks the two
kernels' decision words bit-for-bit on the chip first.

Run: python tools/k24_depth_probe.py [B ...]
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

from ka9q_viterbi_comparison_tpu import VITERBI224, soft8_spec
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2, large_k4

LOG = lambda *a: print(*a, flush=True)
code = VITERBI224
numeric = soft8_spec(code.R)
rng = np.random.default_rng(0)


def readback(x):
    np.asarray(jax.tree.leaves(x)[0][..., -1:])


def t_once(fn, *a):
    t0 = time.perf_counter()
    readback(fn(*a))
    return time.perf_counter() - t0


def make(B, T, depth):
    syms = jnp.asarray(rng.integers(0, 7, size=(B, T, code.R)), jnp.int32)
    m0 = jnp.zeros((B, code.num_states), jnp.int32)
    if depth == 2:
        f = jax.jit(lambda m, s: large_k2.acs_update_large2.__wrapped__(
            code, numeric, m, s, False, "int16", False, True)[:2])
    else:
        f = jax.jit(lambda m, s: large_k4.acs_update_large4.__wrapped__(
            code, numeric, m, s, False, "int16", True)[:2])
    return f, (m0, syms)


if __name__ == "__main__":
    batches = [int(b) for b in (sys.argv[1:] or ["4", "16"])]
    LOG(f"platform={jax.devices()[0].platform}")

    # Cross-check on chip: same words for a short frame.
    B = 4
    f2, (m0, syms) = make(B, 12, 2)
    f4, _ = make(B, 12, 4)
    m2, w2 = f2(m0, syms)
    m4, w4 = f4(m0, syms)
    ok_w = bool(jnp.array_equal(w2, w4))
    ok_m = bool(jnp.array_equal(m2, m4))
    LOG(f"cross-check T=12: words equal={ok_w} metrics equal={ok_m}")

    for B in batches:
        rows = {}
        for depth in (2, 4):
            fs, args_s = make(B, 8, depth)
            fl, args_l = make(B, 68, depth)
            readback(fs(*args_s)), readback(fl(*args_l))
            ms = []
            for _ in range(7):
                ts = min(t_once(fs, *args_s), t_once(fs, *args_s))
                tl = min(t_once(fl, *args_l), t_once(fl, *args_l))
                ms.append(max((tl - ts) / 60.0, 1e-9))  # per STEP
            med = float(np.median(ms))
            rows[depth] = med
            LOG(f"B={B} depth={depth}: {med*1e3:8.2f} ms/step "
                f"({B * code.R / med / 1e3:7.2f} ksym/s)")
        LOG(f"B={B} speedup depth4/depth2: {rows[2]/rows[4]:.2f}x")
    LOG("ALL DONE")
