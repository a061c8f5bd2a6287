#!/usr/bin/env python
"""Probe: repeat-free radix combine (broadcast into [M, 2^w] row-major views).

jnp.repeat measured ~90x off roofline on this toolchain; broadcasts along a
new minor axis with row-major-compatible reshapes should fuse instead.
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

B, T = 4, 87
code = VITERBI224
n = code.K - 1
S = code.num_states
W = S // 32
rng = np.random.default_rng(0)
words = jnp.asarray(rng.integers(0, 2**32, size=(B, T, W), dtype=np.uint32))
f4_fake = jnp.asarray(rng.integers(0, 16, size=(B, 20, S), dtype=np.uint8))


def marg(body, x, k_lo=1, k_hi=3, reps=3):
    def mk(k):
        @jax.jit
        def run(v):
            def it(_, v_):
                out = body(v_)
                return v_ ^ out.astype(v_.dtype)

            return jax.lax.fori_loop(0, k, it, v)

        return run

    c_lo, c_hi = mk(k_lo), mk(k_hi)
    sync(c_lo(x)); sync(c_hi(x))
    t_lo = t_hi = None
    for _ in range(reps):
        t0 = time.perf_counter(); sync(c_lo(x)); a = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(c_hi(x)); b = time.perf_counter() - t0
        t_lo = a if t_lo is None else min(t_lo, a)
        t_hi = b if t_hi is None else min(t_hi, b)
    return (t_hi - t_lo) / (k_hi - k_lo)


def combine_bcast(lo, hi, w, n):
    lead = lo.shape[:-1]
    M = 1 << (n - w)
    Q = 1 << w
    lo_r = lo.reshape(*lead, Q, M)
    hi_r = hi.reshape(*lead, M, Q)
    out = jnp.zeros_like(hi_r)
    for c in range(Q):
        cand = lo_r[..., c, :, None]
        out = jnp.where(hi_r == c, cand, out)
    return ((out << w) | hi_r).reshape(*lead, Q * M)


def unpack_bcast(wds, n):
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (wds[..., :, None] >> shifts) & jnp.uint32(1)
    return b.astype(jnp.uint8).reshape(*wds.shape[:-1], -1)


def l1_all(wds):
    n2 = T // 2
    pairs = wds[:, : 2 * n2].reshape(B, n2, 2, -1)
    hi = unpack_bcast(pairs[:, :, 1], n)
    lo = unpack_bcast(pairs[:, :, 0], n)
    return combine_bcast(lo, hi, 1, n)


def l3_all(f4):
    return combine_bcast(f4[:, 0:20:2], f4[:, 1:20:2], 4, n)


def main():
    m = marg(lambda w_: l1_all(w_)[0, 0, :1].astype(jnp.uint32), words)
    print(f"L1 bcast (43 win): {m*1e3:9.2f} ms", flush=True)
    m = marg(lambda f_: l3_all(f_)[0, 0, :1], f4_fake)
    print(f"L3 bcast (10 win): {m*1e3:9.2f} ms", flush=True)

    # full ladder, bcast style
    def ladder(wds):
        cur = l1_all(wds)
        width = 2
        while width < 8:
            nw = cur.shape[1] // 2
            cur = combine_bcast(cur[:, 0:2*nw:2], cur[:, 1:2*nw:2], width, n)
            width *= 2
        return cur

    m = marg(lambda w_: ladder(w_)[0, 0, :1].astype(jnp.uint32), words)
    print(f"full ladder bcast: {m*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
