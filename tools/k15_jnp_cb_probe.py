#!/usr/bin/env python
"""Probe: portable-jnp K=15 chainback formulations at bench shapes.

The published tpu_jnp K=15 chainback (ops/chainback.py lax.scan +
take_along_axis) re-reads the whole [B, W] word row every step -- ~1 GB
per walk at the bench's B=256, T=2062, an HBM floor of ~48 Mbit/s vs the
reference's 93 M spiral column.  Candidates that touch only the needed
words:

  a) baseline: the current scan walk (measured reference point);
  b) plane walk over radix f4/f8 tables (ops/radix_planes jnp build),
     scan over rounds, per-frame scalar dynamic_slice fetches in-body
     (B fetches per round; pipelining across frames is the question);
  c) b's fetch loop at width 8 (half the rounds).

Prints walk time and implied Mbit/s; table build (repack) timed
separately -- it rides the update phase like the K=24 route.

MEASURED OUTCOME (v5e, B=256, T=2062, chained marginals with scalar-fetch
sync): the baseline runs 11.5 ms = 45.6 Mbit/s -- within ~10 % of the
~96 GB/s XLA elementwise ceiling for its 1 GB of re-read decision rows,
i.e. the portable formulation is at ITS OWN HBM floor.  Every candidate
loses or ties: per-frame scalar plane walks serialize 256 fetches x
512/256 rounds (209/106 ms); merged-row take_along_axis gathers stream
the same bytes per round (13.4/12.3 ms = 39/43 Mbit/s).  The jnp K=15
chainback therefore REMAINS a documented losing cell vs the reference's
93 M scalar walk (a CPU re-reads 8 bytes per step from L1; the portable
XLA path re-reads the whole [B, W] row from HBM) -- closing it requires
the Pallas route's VMEM residency, which is exactly what the tpu_pallas
family publishes (357 Mbit/s).

Run: python tools/k15_jnp_cb_probe.py [B] [T] [reps]
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

from ka9q_viterbi_comparison_tpu.configs import VITERBI615
from ka9q_viterbi_comparison_tpu.ops import chainback as cb, radix_planes as rp

code = VITERBI615
B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
T = int(sys.argv[2]) if len(sys.argv) > 2 else 2062
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
N = code.K - 1
W = code.num_states // 32
ANCHOR = code.K - 1
ndata = T - ANCHOR

print(f"platform={jax.devices()[0].platform} B={B} T={T} W={W}", flush=True)
rng = np.random.default_rng(0)
words_bm = jnp.asarray(rng.integers(0, 2**32, size=(B, T, W), dtype=np.uint32))
words_tm = jnp.transpose(words_bm, (1, 0, 2))


def timeit(name, fn, *args, bits=None):
    """Chained marginal: k data-dependent executions inside one jit (the
    dev rig memoizes identical dispatches, so independent same-input reps
    time as one RTT -- the harness/bench.py lesson)."""
    first = args[0]

    def chain(k):
        @jax.jit
        def run(x, rest):
            out = None
            for _ in range(k):
                out = fn(x, *rest) if rest else fn(x)
                # fold a value derived from the output back into the input
                leaf = jax.tree.leaves(out)[0]
                x = x ^ jnp.broadcast_to(
                    leaf.reshape(-1)[:1].astype(x.dtype), x.shape)
            return out
        return run

    def fetch(out):
        # block_until_ready can acknowledge before execution on this
        # transport; a scalar host fetch cannot (harness/bench.py sync()).
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.reshape(-1)[-1:])

    rest = args[1:]
    c1, cN = chain(1), chain(4)
    fetch(c1(first, rest))
    fetch(cN(first, rest))
    t1 = min((lambda t0: (fetch(c1(first, rest)),
                          time.perf_counter() - t0)[1])(time.perf_counter())
             for _ in range(REPS))
    tn = min((lambda t0: (fetch(cN(first, rest)),
                          time.perf_counter() - t0)[1])(time.perf_counter())
             for _ in range(REPS))
    best = max((tn - t1) / 3, 1e-9)
    extra = f" -> {bits / best / 1e6:8.2f} Mbit/s" if bits else ""
    print(f"{name:24s} {best*1e3:9.3f} ms{extra}", flush=True)
    return jax.block_until_ready(c1(first, rest))


nbits_total = B * ndata

# a) baseline
timeit("scan+take (current)",
       lambda w: cb.chainback_bits.__wrapped__(code, w, ndata)[0],
       words_bm, bits=nbits_total)

# table builds (ride update)
t4 = timeit("build f4 (v<=2 combines)",
            lambda w: rp.build_plane_tables.__wrapped__(code, w, ANCHOR, None, 4)["f4"],
            words_tm)
tabs8 = None


def build8(w):
    t = rp.build_plane_tables.__wrapped__(code, w, ANCHOR, None, 8)
    return t["f4"], t["f8"], t["g2"]


r8 = timeit("build f4+f8 (v=4 combine)", build8, words_tm)


def walk(tables, width):
    """Scan over rounds; B scalar fetches per round."""
    tab = tables
    nseg = (T - ANCHOR) // width
    mask = jnp.int32(code.num_states - 1)

    def body(state, p):
        ks = []
        for b in range(B):
            s = state[b]
            idx = (s >> 5).astype(jnp.int32)
            if width == 8:
                word = jax.lax.dynamic_slice(
                    tab, (p, (s >> 2) & 7, b, idx), (1, 1, 1, 1)).reshape(())
                F = ((word >> ((s & 3) * 8).astype(jnp.uint32))
                     & jnp.uint32(0xFF)).astype(jnp.int32)
            else:
                word = jax.lax.dynamic_slice(
                    tab, (p, s & 3, b, idx), (1, 1, 1, 1)).reshape(())
                F = ((word >> (((s >> 2) & 7) * 4).astype(jnp.uint32))
                     & jnp.uint32(0xF)).astype(jnp.int32)
            ks.append(F)
        F = jnp.stack(ks)
        return (state >> width) | (F << (N - width)), F

    end, Fs = jax.lax.scan(body, jnp.zeros((B,), jnp.int32),
                           jnp.arange(nseg - 1, -1, -1, dtype=jnp.int32))
    return Fs


f4 = t4
timeit("plane walk w=4", lambda t: walk(t, 4), f4, bits=nbits_total)
f8 = r8[1]
timeit("plane walk w=8", lambda t: walk(t, 8), f8, bits=nbits_total)


def walk_gather(tab, width):
    """One take_along_axis per round over [B, planes*W] merged rows."""
    nseg = (T - ANCHOR) // width
    np_, d_, B_, W_ = tab.shape
    tabm = tab.transpose(0, 2, 1, 3).reshape(np_, B_, d_ * W_)

    def body(state, tab_p):
        s = state
        if width == 8:
            idx = ((s >> 2) & 7) * W_ + (s >> 5)
            sh = ((s & 3) * 8).astype(jnp.uint32)
            fmask = jnp.uint32(0xFF)
        else:
            idx = (s & 3) * W_ + (s >> 5)
            sh = (((s >> 2) & 7) * 4).astype(jnp.uint32)
            fmask = jnp.uint32(0xF)
        words = jnp.take_along_axis(tab_p, idx[:, None], axis=-1)[:, 0]
        F = ((words >> sh) & fmask).astype(jnp.int32)
        return (s >> width) | (F << (N - width)), F

    end, Fs = jax.lax.scan(body, jnp.zeros((B,), jnp.int32), tabm[::-1])
    return Fs


timeit("gather walk w=4", lambda t: walk_gather(t, 4), f4, bits=nbits_total)
timeit("gather walk w=8", lambda t: walk_gather(t, 8), f8, bits=nbits_total)
