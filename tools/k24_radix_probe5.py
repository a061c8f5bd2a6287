#!/usr/bin/env python
"""Probe: can XLA's own gather (take_along_axis) build the radix ladder?

If the TPU lowers a minor-dim gather on [B, S] at acceptable speed, the
ladder is one gather per level per window and no select-chains are needed.
Also probes word-level packed ops (int32 domain, no uint8, no 8M-element
byte arrays).
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

B = 4
code = VITERBI224
n = code.K - 1
S = code.num_states
rng = np.random.default_rng(0)


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


def main():
    # 1. gather: one level-3 combine (4->8) via take_along_axis, one window
    f4 = jnp.asarray(rng.integers(0, 16, size=(B, S), dtype=np.int32))

    def l3_gather(hi):
        idx = (jnp.arange(S, dtype=jnp.int32) >> 4)[None, :] + (hi << (n - 4))
        lo_sel = jnp.take_along_axis(hi, idx, axis=-1)  # same array as dummy lo
        return (lo_sel << 4) | hi

    m = marg(lambda v: l3_gather(v) & 0xff, f4)
    print(f"L3 combine via gather (1 win, int32): {m*1e3:9.2f} ms", flush=True)

    # 2. word-level packed int32: upsample-by-4 via repeat + shifts (2M words)
    wds = jnp.asarray(rng.integers(0, 2**31, size=(B, S // 16), dtype=np.int32))

    def packed_ops(w_):
        r = jnp.repeat(w_, 4, axis=-1)[:, : S // 16]
        pos = (jnp.arange(S // 16, dtype=jnp.int32) & 3) << 3
        return (r >> pos) & 0xffff

    m = marg(packed_ops, wds, 1, 9)
    print(f"packed word repeat+shift (2M int32) : {m*1e3:9.2f} ms", flush=True)

    # 3. uint8 elementwise baseline: one where over [B, S] uint8
    a8 = jnp.asarray(rng.integers(0, 256, size=(B, S), dtype=np.uint8))

    def u8_where(v):
        return jnp.where(v > 128, v, v ^ jnp.uint8(3))

    m = marg(u8_where, a8, 1, 9)
    print(f"single uint8 where over [B, S]      : {m*1e3:9.2f} ms", flush=True)

    # 4. int32 elementwise baseline over [B, S]
    a32 = jnp.asarray(rng.integers(0, 2**31, size=(B, S), dtype=np.int32))

    def i32_where(v):
        return jnp.where(v > 128, v, v ^ 3)

    m = marg(i32_where, a32, 1, 9)
    print(f"single int32 where over [B, S]      : {m*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
