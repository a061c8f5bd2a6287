#!/usr/bin/env python
"""HW probe: radix-packed K=24 traceback vs the per-step slice walk.

Measures, with in-jit marginal chains (transport overhead cancels):
  1. plain walk chainback (current shipped path) bit rate
  2. radix walk chainback bit rate (tables prebuilt)
  3. plain update marginal vs update+repack marginal (the repack rides
     the update phase; its cost must be a few percent)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ka9q_viterbi_comparison_tpu.configs import VITERBI224, soft8_spec
from ka9q_viterbi_comparison_tpu.harness.bench import sync
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops import chainback as cb, radix
from ka9q_viterbi_comparison_tpu.ops import acs
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors


def marginal(make_chain, lo, hi, reps=3):
    c_lo, c_hi = make_chain(lo), make_chain(hi)
    sync(c_lo()); sync(c_hi())
    t_lo = t_hi = None
    for _ in range(reps):
        t0 = time.perf_counter(); sync(c_lo()); a = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(c_hi()); b = time.perf_counter() - t0
        t_lo = a if t_lo is None else min(t_lo, a)
        t_hi = b if t_hi is None else min(t_hi, b)
    return (t_hi - t_lo) / (hi - lo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--bytes", type=int, default=8)
    p.add_argument("--w", type=int, default=8)
    args = p.parse_args()
    code, numeric = VITERBI224, soft8_spec(2)
    B, nbytes = args.batch, args.bytes
    nbits = nbytes * 8
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(B, nbytes), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R).astype(jnp.int32)
    T = syms.shape[1]
    print(f"B={B} bytes={nbytes} T={T} w={args.w}", flush=True)

    m0 = acs.init_metrics(code, numeric, B)
    m, words, _ = sync(large_k2.acs_update_large2(code, numeric, m0, syms, False))
    tabs = sync(radix.build_radix_tables(code, words, args.w))

    # Correctness on the real decode
    out = np.asarray(radix.chainback_radix(code, words, tabs, nbits, 0, args.w))
    print("radix decode errors:", count_bit_errors(out, data), flush=True)

    # 1+2: chainback chains (data-dependent endstates defeat CSE)
    def make_cb_chain(fn):
        def make(k):
            @jax.jit
            def run(words, tabs):
                out0 = fn(words, tabs, jnp.int32(0))

                def body(_, carry):
                    es, prev = carry
                    o = fn(words, tabs, es)
                    return o[0, -1].astype(jnp.int32), o

                _, o = jax.lax.fori_loop(
                    0, k - 1, body, (out0[0, -1].astype(jnp.int32), out0))
                return o

            return lambda: run(words, tabs)
        return make

    plain = make_cb_chain(lambda wds, _tabs, es: cb.chainback(code, wds, nbits, es))
    rx = make_cb_chain(lambda wds, tabs, es: radix.chainback_radix(code, wds, tabs, nbits, es, args.w))
    bits_total = B * nbits
    m_plain = marginal(plain, 4, 36)
    print(f"plain walk : {m_plain*1e3:8.3f} ms/call  {bits_total/m_plain/1e6:8.3f} Mbit/s", flush=True)
    m_rx = marginal(rx, 4, 68)
    print(f"radix walk : {m_rx*1e3:8.3f} ms/call  {bits_total/m_rx/1e6:8.3f} Mbit/s", flush=True)

    # 3: update with/without repack
    def make_up_chain(with_repack):
        def make(k):
            @jax.jit
            def run(m0, syms):
                m, w, _ = large_k2.acs_update_large2(code, numeric, m0, syms, False)

                def body(_, carry):
                    m, w = carry
                    m2, w2, _ = large_k2.acs_update_large2(code, numeric, m, syms, False)
                    return (m2, w2)

                m, w = jax.lax.fori_loop(0, k - 1, body, (m, w))
                if with_repack:
                    t = radix.build_radix_tables(code, w, args.w)
                    return m, w, t
                return m, w

            return lambda: run(m0, syms)
        return make

    sym_rate = B * T * code.R
    m_up = marginal(make_up_chain(False), 1, 3)
    print(f"update           : {m_up*1e3:8.1f} ms/call  {sym_rate/m_up:8.1f} sym/s", flush=True)
    # repack cost = one repack per chain (not per link): time at fixed k, diff
    def one(with_repack):
        c = make_up_chain(with_repack)(2)
        sync(c())
        best = None
        for _ in range(3):
            t0 = time.perf_counter(); sync(c()); d = time.perf_counter() - t0
            best = d if best is None else min(best, d)
        return best
    t_plain, t_rep = one(False), one(True)
    print(f"repack overhead  : {(t_rep-t_plain)*1e3:8.1f} ms on {t_plain*1e3:.1f} ms "
          f"({(t_rep-t_plain)/ (2*t_plain) *100:.1f}% per 2-link chain)", flush=True)


if __name__ == "__main__":
    main()
