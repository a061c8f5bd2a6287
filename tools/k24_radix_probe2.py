#!/usr/bin/env python
"""Stage-by-stage HW profile of the radix repack at K=24 shapes.

Finds where build_radix_tables' time goes: unpack, level-1 combine, pair
levels, and dtype variants (uint8 vs int32 compute).
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


def timed(fn, *args, reps=3):
    f = jax.jit(fn)
    sync(f(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    return best


def unpack32(wds, dtype):
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (wds[..., :, None] >> shifts) & jnp.uint32(1)
    return b.reshape(*wds.shape[:-1], -1).astype(dtype)


def combine(lo, hi, w, dtype):
    lead = lo.shape[:-1]
    lo_r = lo.reshape(*lead, 1 << w, 1 << (n - w))
    out = None
    for c in range(1 << w):
        cand = jnp.repeat(lo_r[..., c, :], 1 << w, axis=-1)
        out = cand if out is None else jnp.where(hi == dtype(c), cand, out)
    return (out << w) | hi


def main():
    for dtype in (jnp.uint8, jnp.int32):
        name = dtype.__name__
        # 1. unpack two rows
        t = timed(lambda w2: (unpack32(w2[:, 0], dtype), unpack32(w2[:, 1], dtype)),
                  words[:, :2])
        print(f"[{name}] unpack 2 rows      : {t*1e3:9.2f} ms", flush=True)

        # 2. single level-1 combine (one window)
        lo = unpack32(words[:, 0], dtype)
        hi = unpack32(words[:, 1], dtype)
        lo, hi = sync(jax.jit(lambda a, b: (a, b))(lo, hi))
        t = timed(lambda a, b: combine(a, b, 1, dtype), lo, hi)
        print(f"[{name}] combine w=1 (1 win): {t*1e3:9.2f} ms", flush=True)

        f2 = sync(jax.jit(lambda a, b: combine(a, b, 1, dtype))(lo, hi))
        t = timed(lambda a, b: combine(a, b, 2, dtype), f2, f2)
        print(f"[{name}] combine w=2 (1 win): {t*1e3:9.2f} ms", flush=True)

        f4 = sync(jax.jit(lambda a, b: combine(a, b, 2, dtype))(f2, f2))
        t = timed(lambda a, b: combine(a, b, 4, dtype), f4, f4)
        print(f"[{name}] combine w=4 (1 win): {t*1e3:9.2f} ms", flush=True)

    # full ladder as shipped (uint8)
    t = timed(lambda w_: radix.build_radix_tables(code, w_), words)
    print(f"[shipped] full build_radix_tables: {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
