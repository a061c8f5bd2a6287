#!/usr/bin/env python
"""Probe set 7: unrolled walks + chunked bcast ladder levels.

Hypotheses from probes 4-6:
  * the 0.38us-vs-1.7us fetch gap is lax.scan per-step overhead, not array
    size -> an UNROLLED plain walk should hit ~0.4us/fetch too;
  * broadcast-into-minor-axis combines (no jnp.repeat, no merges except the
    level output) run near roofline if the unpack stays in uint8 via a
    bitcast byte view.
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
f2_fake = jnp.asarray(rng.integers(0, 4, size=(B, 43, S), dtype=np.uint8))
f4_fake = jnp.asarray(rng.integers(0, 16, size=(B, 21, S), dtype=np.uint8))


def marg(body, x, k_lo=1, k_hi=3, reps=3, feedback=True):
    def mk(k):
        @jax.jit
        def run(v):
            def it(_, v_):
                out = body(v_)
                return v_ ^ out.astype(v_.dtype) if feedback else v_

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


def plain_walk_unrolled(wds, es):
    state = [jnp.int32(es + b) & (S - 1) for b in range(B)]
    ks = []
    for t in range(T - 1, -1, -1):
        row = []
        for b in range(B):
            s = state[b]
            idx = (s >> 5).astype(jnp.int32)
            word = jax.lax.dynamic_slice(wds, (b, t, idx), (1, 1, 1))[0, 0, 0]
            k = ((word >> (s & 31).astype(jnp.uint32)) & 1).astype(jnp.int32)
            state[b] = (s >> 1) | (k << (n - 1))
            row.append(k)
        ks.append(jnp.stack(row))
    return jnp.stack(ks).sum() + jnp.stack(state).sum()


def radix4_walk_unrolled(wds, f2, es):
    state = [jnp.int32(es + b) & (S - 1) for b in range(B)]
    acc = []
    # single at t=86 from words
    for b in range(B):
        s = state[b]
        idx = (s >> 5).astype(jnp.int32)
        word = jax.lax.dynamic_slice(wds, (b, 86, idx), (1, 1, 1))[0, 0, 0]
        k = ((word >> (s & 31).astype(jnp.uint32)) & 1).astype(jnp.int32)
        state[b] = (s >> 1) | (k << (n - 1))
        acc.append(k)
    for w_i in range(42, -1, -1):
        for b in range(B):
            s = state[b]
            F = jax.lax.dynamic_slice(f2, (b, w_i, s), (1, 1, 1))[0, 0, 0].astype(jnp.int32)
            state[b] = (s >> 2) | (F << (n - 2))
            acc.append(F)
    return jnp.stack(acc).sum() + jnp.stack(state).sum()


def l1_bcast_u8(wds_pair):
    """[B, nw, 2, W] uint32 -> f2 [B, nw, S] uint8, uint8-domain unpack."""
    nw = wds_pair.shape[1]
    by = jax.lax.bitcast_convert_type(wds_pair, jnp.uint8)  # [B,nw,2,W,4]
    by = by.reshape(B, nw, 2, W * 4)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (by[..., None] >> shifts) & jnp.uint8(1)  # [B,nw,2,W*4,8]
    hi = bits[:, :, 1].reshape(B, nw, S)
    lo = bits[:, :, 0].reshape(B, nw, S)
    lo_r = lo.reshape(B, nw, 2, S // 2)
    hi_r = hi.reshape(B, nw, S // 2, 2)
    c0 = lo_r[:, :, 0, :, None]
    c1 = lo_r[:, :, 1, :, None]
    out = jnp.where(hi_r == 1, c1, c0)
    return ((out << 1) | hi_r).reshape(B, nw, S)


def combine_bcast(lo, hi, w):
    lead = lo.shape[:-1]
    M = 1 << (n - w)
    Q = 1 << w
    lo_r = lo.reshape(*lead, Q, M)
    hi_r = hi.reshape(*lead, M, Q)
    out = jnp.zeros_like(hi_r)
    for c in range(Q):
        out = jnp.where(hi_r == c, lo_r[..., c, :, None], out)
    return ((out << w) | hi_r).reshape(*lead, Q * M)


def main():
    m = marg(lambda w_: plain_walk_unrolled(w_, jnp.int32(0)).astype(jnp.uint32),
             words, 1, 9)
    print(f"plain walk UNROLLED : {m*1e6:9.1f} us  {B*64/m/1e6:7.2f} Mbit/s "
          f"({m/(T*B)*1e9:6.0f} ns/fetch)", flush=True)

    def rx4(w_):
        return radix4_walk_unrolled(w_, f2_fake, jnp.int32(0)).astype(jnp.uint32)

    m = marg(rx4, words, 1, 9)
    nf = (1 + 43) * B
    print(f"radix4 walk UNROLLED: {m*1e6:9.1f} us  {B*64/m/1e6:7.2f} Mbit/s "
          f"({m/nf*1e9:6.0f} ns/fetch)", flush=True)

    # L1 bcast chunked: map over chunks of 4 windows
    def l1_chunked(w_):
        n2 = 40  # probe 40 windows in chunks of 4
        pairs = w_[:, : 2 * n2].reshape(B, 10, 4, 2, W)

        def one(p):
            return l1_bcast_u8(p)

        out = jax.lax.map(one, pairs.transpose(1, 0, 2, 3, 4))
        return out[0, 0, 0, :1].astype(jnp.uint32)

    m = marg(l1_chunked, words)
    print(f"L1 bcast chunk=4 (40 win): {m*1e3:9.2f} ms", flush=True)

    m = marg(lambda f_: combine_bcast(f_[:, 0:42:2], f_[:, 1:42:2], 2)[0, 0, :1],
             f2_fake)
    print(f"L2 bcast (21 win)        : {m*1e3:9.2f} ms", flush=True)

    m = marg(lambda f_: combine_bcast(f_[:, 0:20:2], f_[:, 1:20:2], 4)[0, 0, :1],
             f4_fake)
    print(f"L3 bcast (10 win)        : {m*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
