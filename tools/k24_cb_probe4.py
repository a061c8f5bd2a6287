#!/usr/bin/env python
"""K=24 walk, plan C: speculative traceback.

The walk's serial bottleneck is the data-dependent decision-word fetch
(one 4-byte word per step, measured ~1.2 us each, RESULTS.md).  But the
candidate ADDRESSES for steps t-1..t-j are pure functions of the state at
step t: at depth j there are 2^j candidate predecessor states
``(s >> j) | (c << (23-j))``, whose word indices differ from the base by the
STATIC strides ``c << (18-j)``.  So all fetches inside a depth-k block are
data-independent of each other, and each depth's candidate set is one
strided column of a free reshape of the flat decision row.

This probe measures whether either property buys anything on this platform:

  t1: dependent chain baseline (one dynamic_slice per step; production walk)
  t2: the same number of INDEPENDENT dynamic_slice fetches (indices
      precomputed) -- does XLA's sequential TPU schedule overlap them?
  t3: strided candidate fetch -- one [2^j, 1] dynamic_slice on a
      [2^j, W >> j] reshape fetches all 2^j depth-j candidates in ONE op.
  t4: full speculative depth-4 walk (4 strided fetches + in-register
      resolve per 4 steps), checked bit-exact against the plain walk.

MEASURED VERDICT (v5e, 2026-08-17): speculation loses.  The speculative
walk is bit-exact but 3-7x SLOWER per bit than the plain dependent walk
(d=6: 7.1 us/bit vs 2.3 us/bit plain, single frame) -- every fetch op pays
the platform's per-op issue overhead whether or not its address was
data-independent, and XLA shows no reliable overlap of independent
dynamic_slices (t1/t2 marginals flip run-to-run under contention; the
micro-marginals are ~1% of the rig's 60-80 ms dispatch jitter).  The
dependent-fetch latency floor documented in RESULTS.md stands.
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

LOG = lambda *a: print(*a, flush=True)

KREG = 23          # state register bits (K - 1)
W = (1 << KREG) // 32   # words per decision row
T = 87             # trellis steps for the 8-byte ICE frame


def marginal(fn1, fnN, n_extra, args, iters=5):
    def timed(fn):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        np.asarray(jax.tree.leaves(r)[-1])  # force a fetch (BUR lies on axon)
        return time.perf_counter() - t0

    jax.block_until_ready(fn1(*args)); jax.block_until_ready(fnN(*args))
    margs = []
    for _ in range(iters):
        t1 = min(timed(fn1), timed(fn1))
        tn = timed(fnN)
        margs.append(max((tn - t1) / n_extra, 1e-12))
    return float(np.median(margs))


def dependent_chain(n):
    @jax.jit
    def run(flat, s0):
        s = s0
        acc = jnp.uint32(0)
        for t in range(n):
            idx = (s >> 5).astype(jnp.int32)
            w = jax.lax.dynamic_slice(flat, (idx,), (1,))[0]
            b = (w >> (s & 31).astype(jnp.uint32)) & 1
            acc = acc ^ w
            s = (s >> 1) | (b << (KREG - 1))
        return s, acc
    return run


def independent_fetches(n):
    @jax.jit
    def run(flat, s0):
        acc = jnp.uint32(0)
        for t in range(n):
            # indices derived from s0 alone -- no cross-fetch dependence
            idx = ((s0 + jnp.uint32(t * 977)) % jnp.uint32(W)).astype(jnp.int32)
            w = jax.lax.dynamic_slice(flat, (idx,), (1,))[0]
            acc = acc ^ w
        return s0, acc
    return run


def strided_fetch(n, depth):
    """n fetches, each grabbing 2^depth candidate words in one strided op."""
    C = 1 << depth

    @jax.jit
    def run(flat, s0):
        view = flat.reshape(C, W >> depth)
        acc = jnp.zeros((C, 1), jnp.uint32)
        for t in range(n):
            base = ((s0 + jnp.uint32(t * 977)) % jnp.uint32(W >> depth)).astype(jnp.int32)
            ws = jax.lax.dynamic_slice(view, (0, base), (C, 1))
            acc = acc ^ ws
        return s0, acc
    return run


def speculative_walk(n_blocks, depth):
    """Resolve `depth` steps per block: one strided fetch per depth level."""

    @jax.jit
    def run(rows, s0):
        # rows: [T, W] uint32 (one decision row per step, most-recent first)
        s = s0
        bits = []
        for blk in range(n_blocks):
            fetched = []   # per level j: [2^j] candidate words
            for j in range(depth):
                C = 1 << j
                view = rows[blk * depth + j].reshape(C, W >> j)
                # candidate states (s >> j) | (c << (KREG - j)); word index
                # = state >> 5 = base + c * (W >> j) with base = (s >> j) >> 5
                base = ((s >> jnp.uint32(j)) >> 5).astype(jnp.int32)
                ws = jax.lax.dynamic_slice(view, (0, base), (C, 1))[:, 0]
                fetched.append(ws)
            # resolve the depth bits in-register
            c = jnp.uint32(0)        # accumulated bits b0 + 2 b1 + ...
            for j in range(depth):
                ws = fetched[j]
                # select candidate word c from the 2^j fetched
                sel = jnp.uint32(0)
                for cc in range(1 << j):
                    sel = sel ^ jnp.where(c == cc, ws[cc], jnp.uint32(0))
                cand_state = (s >> jnp.uint32(j)) | (c << jnp.uint32(KREG - j))
                b = (sel >> (cand_state & 31)) & 1
                bits.append(b)
                c = c | (b << jnp.uint32(j))
            s = (s >> jnp.uint32(depth)) | (c << jnp.uint32(KREG - depth))
        return s, jnp.stack(bits)
    return run


def plain_walk(n_steps):
    @jax.jit
    def run(rows, s0):
        s = s0
        bits = []
        for t in range(n_steps):
            idx = (s >> 5).astype(jnp.int32)
            w = jax.lax.dynamic_slice(rows[t], (idx,), (1,))[0]
            b = (w >> (s & 31).astype(jnp.uint32)) & 1
            bits.append(b)
            s = (s >> 1) | (b << (KREG - 1))
        return s, jnp.stack(bits)
    return run


def main():
    LOG(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.integers(0, 2**32, size=(W,), dtype=np.uint32))
    rows = jnp.asarray(rng.integers(0, 2**32, size=(T + 1, W), dtype=np.uint32))
    s0 = jnp.uint32(0x2A5A5A)

    n_lo, n_hi = 8, 72
    for name, mk in (("t1_dependent", dependent_chain),
                     ("t2_independent", independent_fetches)):
        t0 = time.time()
        m = marginal(mk(n_lo), mk(n_hi), n_hi - n_lo, (flat, s0))
        LOG(f"{name}: {m*1e9:.0f} ns/fetch (compile+run {time.time()-t0:.0f}s)")

    for depth in (2, 4, 6):
        t0 = time.time()
        m = marginal(strided_fetch(n_lo, depth), strided_fetch(n_hi, depth),
                     n_hi - n_lo, (flat, s0))
        LOG(f"t3_strided d={depth}: {m*1e9:.0f} ns per {1<<depth}-cand fetch "
            f"(compile+run {time.time()-t0:.0f}s)")

    # correctness of the speculative resolve vs the plain walk
    depth = 4
    nb = 4
    sw = speculative_walk(nb, depth)
    pw = plain_walk(nb * depth)
    s_a, bits_a = jax.tree.map(np.asarray, sw(rows, s0))
    s_b, bits_b = jax.tree.map(np.asarray, pw(rows, s0))
    ok = (s_a == s_b) and np.array_equal(bits_a, bits_b)
    LOG(f"t4 speculative d={depth} correctness: {'OK' if ok else 'MISMATCH'} "
        f"(state {s_a:#x} vs {s_b:#x})")

    # speed: blocks marginal, per decoded bit
    for depth in (2, 4, 6):
        lo_b, hi_b = 2, 18
        m = marginal(speculative_walk(lo_b, depth), speculative_walk(hi_b, depth),
                     (hi_b - lo_b) * depth, (rows, s0))
        LOG(f"t4 speculative d={depth}: {m*1e9:.0f} ns/bit -> "
            f"{1e9/max(m*1e9,1e-9)/1e6:.2f} Mbit/s single-frame")
    m = marginal(plain_walk(lo_b * 4), plain_walk(hi_b * 4),
                 (hi_b - lo_b) * 4, (rows, s0))
    LOG(f"t4 plain walk: {m*1e9:.0f} ns/bit -> {1e9/max(m*1e9,1e-9)/1e6:.2f} Mbit/s")


if __name__ == "__main__":
    main()
