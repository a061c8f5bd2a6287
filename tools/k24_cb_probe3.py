#!/usr/bin/env python
"""K=24 walk, plan B: pure-XLA variants of the per-step word fetch.

The Pallas DMA route is closed (make_async_copy from ANY crashes this
toolchain's compile helper -- tools/k24_cb_probe2.py), so probe how XLA
lowers small dynamic fetches from the [B, T, W] decision array:

  v1: take_along_axis gather (current ops/chainback.py walk) -- baseline;
      measured to stream the whole [B, W] slice per step.
  v2: per-frame lax.dynamic_slice (B statically unrolled) inside the scan.
  v3: single flat-offset dynamic_slice per frame on the flattened array.
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
from ka9q_viterbi_comparison_tpu.ops import acs, chainback as cb
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2
from ka9q_viterbi_comparison_tpu.utils.bits import count_bit_errors

LOG = lambda *a: print(*a, flush=True)
code = VITERBI224
K = code.K


def walk_v2(words, end):
    """words [B, T, W] uint32, end [B] int32 -> bits [B, T] uint8."""
    B, T, W = words.shape

    def body(state, t):
        ks = []
        for b in range(B):
            idx = (state[b] >> 5).astype(jnp.int32)
            word = jax.lax.dynamic_slice(words, (b, t, idx), (1, 1, 1))[0, 0, 0]
            ks.append((word >> (state[b] & 31).astype(jnp.uint32)).astype(jnp.int32) & 1)
        k = jnp.stack(ks)
        return (state >> 1) | (k << (K - 2)), k.astype(jnp.uint8)

    _, ks = jax.lax.scan(body, end, jnp.arange(T, dtype=jnp.int32), reverse=True)
    return ks.T


def walk_v3(words, end):
    B, T, W = words.shape
    flat = words.reshape(-1)

    def body(state, t):
        ks = []
        for b in range(B):
            off = (b * T + t) * W + (state[b] >> 5)
            word = jax.lax.dynamic_slice(flat, (off.astype(jnp.int32),), (1,))[0]
            ks.append((word >> (state[b] & 31).astype(jnp.uint32)).astype(jnp.int32) & 1)
        k = jnp.stack(ks)
        return (state >> 1) | (k << (K - 2)), k.astype(jnp.uint8)

    _, ks = jax.lax.scan(body, end, jnp.arange(T, dtype=jnp.int32), reverse=True)
    return ks.T


def marginal(one_fn, words, B, iters=5, n_chain=9):
    @jax.jit
    def c1(w):
        return one_fn(w, jnp.zeros((B,), jnp.int32))

    @jax.jit
    def cn(w):
        bits = one_fn(w, jnp.zeros((B,), jnp.int32))
        for _ in range(n_chain - 1):
            es = jnp.broadcast_to(bits[0, 0].astype(jnp.int32), (B,))
            bits = one_fn(w, es)
        return bits

    jax.block_until_ready(c1(words))
    jax.block_until_ready(cn(words))

    def timed(fn):
        t0 = time.perf_counter()
        r = fn(words)
        np.asarray(r[-1, -1])
        return time.perf_counter() - t0

    margs = []
    for _ in range(iters):
        t1 = min(timed(c1), timed(c1))
        tn = timed(cn)
        margs.append(max((tn - t1) / (n_chain - 1), 1e-9))
    return float(np.median(margs))


def run(B=4, nb=8):
    numeric = soft8_spec(code.R)
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=(B, nb), dtype=np.uint8)
    syms = encode_frames(code, numeric, jnp.asarray(data)).reshape(B, -1, code.R)
    T = syms.shape[1]
    m0 = acs.init_metrics(code, numeric, B)
    _, words, _ = jax.block_until_ready(
        large_k2.acs_update_large2(code, numeric, m0, syms))
    LOG(f"B={B}: words ready {words.shape}")

    ref_bits = None
    for name, fn in [("v2_dynslice", walk_v2), ("v3_flat", walk_v3)]:
        try:
            bits = jax.block_until_ready(jax.jit(fn)(words, jnp.zeros((B,), jnp.int32)))
            from ka9q_viterbi_comparison_tpu.utils.bits import bits_to_bytes
            out = bits_to_bytes(bits[:, code.K - 1 : code.K - 1 + nb * 8])
            errs = count_bit_errors(np.asarray(out), data)
            marg = marginal(fn, words, B)
            LOG(f"B={B} {name}: {marg*1e3:.2f} ms -> {B*nb*8/marg/1e6:.2f} Mbit/s "
                f"(errors {errs})")
        except Exception as e:  # noqa: BLE001
            LOG(f"B={B} {name}: FAIL {str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    LOG(f"backend: {jax.default_backend()}")
    run(B=4)
    run(B=16)
    LOG("ALL DONE")
