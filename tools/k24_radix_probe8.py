#!/usr/bin/env python
"""Probe set 8: the repack ladder only (no walks).

Measures, on HW:
  * bitcast u32->u8[4] endianness (exactness gate for the uint8 unpack);
  * L1 (words -> width-2 fields) with the uint8-domain bitcast unpack,
    chunked via lax.map;
  * L2 (2->4) and L3 (4->8) broadcast combines, chunked;
  * the full ladder end-to-end, as build time to ride the update phase
    (update kernel itself: ~123 ms for T=87, B=4).
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


def unpack_u8(wds):
    """[..., W] uint32 -> [..., S] uint8 bits, uint8-domain after bitcast.

    Bit of state s lives at word s>>5, position s&31; the bitcast byte view
    must therefore put word bits [0..8) in byte 0 (little-endian order).
    """
    by = jax.lax.bitcast_convert_type(wds, jnp.uint8)  # [..., W, 4]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (by[..., None] >> shifts) & jnp.uint8(1)  # [..., W, 4, 8]
    return bits.reshape(*wds.shape[:-1], W * 32)


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
    # --- exactness gate: bitcast endianness on this backend ---
    w0 = jnp.asarray(rng.integers(0, 2**32, size=(1, W), dtype=np.uint32))
    got = np.asarray(unpack_u8(w0))[0]
    wn = np.asarray(w0)[0]
    ref = ((wn[:, None] >> np.arange(32, dtype=np.uint32)) & 1).astype(
        np.uint8).reshape(-1)
    ok = np.array_equal(got, ref)
    print(f"bitcast LE unpack exact: {ok}", flush=True)
    if not ok:
        print("  -> byte order differs; would need byte reversal", flush=True)

    # --- L1: words -> width-2 fields, chunked ---
    def l1(wds, chunk):
        n2 = T // 2  # 43
        use = (n2 // chunk) * chunk
        pairs = wds[:, : 2 * use].reshape(B, use // chunk, chunk, 2, W)

        def one(p):  # [B, chunk, 2, W]
            hi = unpack_u8(p[:, :, 1])
            lo = unpack_u8(p[:, :, 0])
            return combine_bcast(lo, hi, 1)

        out = jax.lax.map(one, pairs.transpose(1, 0, 2, 3, 4))
        return out[0, 0, 0, :1]

    for chunk in (1, 4, 43):
        m = marg(lambda w_, c=chunk: l1(w_, c).astype(jnp.uint32), words)
        nwin = (43 // chunk) * chunk
        print(f"L1 u8 chunk={chunk:3d} ({nwin} win): {m*1e3:9.2f} ms",
              flush=True)

    # --- L2: 2 -> 4 ---
    def l2(f2, chunk):
        nw = 21
        use = (nw // chunk) * chunk
        lo = f2[:, 0 : 2 * use : 2].reshape(B, use // chunk, chunk, S)
        hi = f2[:, 1 : 2 * use : 2].reshape(B, use // chunk, chunk, S)

        def one(p):
            return combine_bcast(p[0], p[1], 2)

        out = jax.lax.map(
            lambda p: one(p), jnp.stack([lo, hi]).transpose(2, 0, 1, 3, 4))
        return out[0, 0, 0, :1]

    for chunk in (1, 21):
        m = marg(lambda f_, c=chunk: l2(f_, c).astype(jnp.uint8), f2_fake)
        print(f"L2 chunk={chunk:3d}: {m*1e3:9.2f} ms", flush=True)

    # --- L3: 4 -> 8 (Q=16 selects) ---
    def l3(f4, chunk):
        nw = 10
        use = (nw // chunk) * chunk
        lo = f4[:, 0 : 2 * use : 2].reshape(B, use // chunk, chunk, S)
        hi = f4[:, 1 : 2 * use : 2].reshape(B, use // chunk, chunk, S)
        out = jax.lax.map(
            lambda p: combine_bcast(p[0], p[1], 4),
            jnp.stack([lo, hi]).transpose(2, 0, 1, 3, 4))
        return out[0, 0, 0, :1]

    for chunk in (1, 10):
        m = marg(lambda f_, c=chunk: l3(f_, c).astype(jnp.uint8), f4_fake)
        print(f"L3 chunk={chunk:3d}: {m*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
