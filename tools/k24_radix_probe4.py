#!/usr/bin/env python
"""Variant shoot-out for the radix repack stages + radix walk rate.

All marginals are in-jit chained (transport constant cancels).
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
f4_fake = jnp.asarray(rng.integers(0, 16, size=(B, 20, S), dtype=np.uint8))


def marg(make_run, x, k_lo=1, k_hi=3, reps=3):
    def mk(k):
        @jax.jit
        def run(v):
            def it(_, v_):
                out = make_run(v_)
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


def unpack_reshape(wds):  # current
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (wds[..., :, None] >> shifts) & jnp.uint32(1)
    return b.reshape(*wds.shape[:-1], -1).astype(jnp.uint8)


def unpack_repeat(wds):
    rep = jnp.repeat(wds, 32, axis=-1)  # [.., S] uint32
    pos = jnp.arange(rep.shape[-1], dtype=jnp.uint32) & 31
    return ((rep >> pos) & 1).astype(jnp.uint8)


def l1_chunked(wds, unpack, nchunk):
    n2 = T // 2
    n2c = (n2 // nchunk) * nchunk  # drop ragged tail for the probe
    pairs = wds[:, : 2 * n2c].reshape(B, n2c // nchunk, nchunk, 2, -1)

    def one(p):  # [B, nchunk, 2, W]
        hi = unpack(p[:, :, 1])
        lo = unpack(p[:, :, 0])
        return radix._combine(lo, hi, 1, n)

    out = jax.lax.map(one, pairs.transpose(1, 0, 2, 3, 4))
    return out[0, 0, 0, :1]


def l3_vec(f4):  # 10 windows vectorized, no map
    lo = f4[:, 0:20:2]
    hi = f4[:, 1:20:2]
    return radix._combine(lo, hi, 4, n)[0, 0, :1]


def l3_map(f4):
    def one(p):
        return radix._combine(p[:, 0], p[:, 1], 4, n)

    pairs = jnp.stack([f4[:, 0:20:2], f4[:, 1:20:2]], axis=2)
    return jax.lax.map(one, pairs.transpose(1, 0, 2, 3))[0, 0, :1]


def main():
    for name, fn in [
        ("L1 chunk=8  reshape-unpack", lambda w_: l1_chunked(w_, unpack_reshape, 8)),
        ("L1 chunk=8  repeat-unpack ", lambda w_: l1_chunked(w_, unpack_repeat, 8)),
        ("L1 chunk=1  repeat-unpack ", lambda w_: l1_chunked(w_, unpack_repeat, 1)),
    ]:
        m = marg(lambda w_, f=fn: f(w_).astype(jnp.uint32), words)
        print(f"{name}: {m*1e3:9.1f} ms", flush=True)

    for name, fn in [
        ("L3 vectorized (10 win)    ", l3_vec),
        ("L3 map (10 win)           ", l3_map),
    ]:
        m = marg(lambda f4, f=fn: f(f4), f4_fake)
        print(f"{name}: {m*1e3:9.1f} ms", flush=True)

    # radix walk rate with long chains (tables prebuilt, contents irrelevant)
    tabs = {2: jnp.asarray(rng.integers(0, 4, size=(B, 43, S), dtype=np.uint8)),
            4: jnp.asarray(rng.integers(0, 16, size=(B, 21, S), dtype=np.uint8)),
            8: jnp.asarray(rng.integers(0, 256, size=(B, 10, S), dtype=np.uint8))}
    tabs = sync(jax.jit(lambda t: t)(tabs))

    def mk_walk(k):
        @jax.jit
        def run(wds, tabs):
            out0, _ = radix.chainback_radix_bits(code, wds, tabs, 64, jnp.int32(0))

            def body(_, carry):
                es, prev = carry
                o, ss = radix.chainback_radix_bits(code, wds, tabs, 64, es)
                return ss[0].astype(jnp.int32), o

            _, o = jax.lax.fori_loop(
                0, k - 1, body, (out0[0, -1].astype(jnp.int32), out0))
            return o

        return lambda: run(words, tabs)

    c_lo, c_hi = mk_walk(8), mk_walk(520)
    sync(c_lo()); sync(c_hi())
    t_lo = t_hi = None
    for _ in range(3):
        t0 = time.perf_counter(); sync(c_lo()); a = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(c_hi()); b = time.perf_counter() - t0
        t_lo = a if t_lo is None else min(t_lo, a)
        t_hi = b if t_hi is None else min(t_hi, b)
    m = (t_hi - t_lo) / 512
    print(f"radix walk (520-link chain): {m*1e6:9.1f} us/walk  "
          f"{B*64/m/1e6:9.2f} Mbit/s", flush=True)


if __name__ == "__main__":
    main()
