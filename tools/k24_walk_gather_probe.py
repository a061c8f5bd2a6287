#!/usr/bin/env python
"""Probe: vectorise the K=24 plane walk's dependent fetches across frames.

The walk (ops/radix_planes.chainback_plane_bits) issues one scalar
dynamic_slice per frame per window round -- B sequential ~0.5 us fetches
per round.  If ONE batched gather (B indices into the round's [4, B, W]
table slice) costs about the same as one scalar fetch, the walk rate
scales with B instead of being flat.

Measures, at K=24 bench shapes (B frames, 16 width-4 rounds):
  a) the current formulation: B scalar fetches per round (python loop);
  b) one flat jnp.take per round over the SAME chained walk;
  c) b) but with the whole walk as one fori_loop (static rounds unrolled
     is the current style; the loop variant shows trace-size effects).

All variants walk identical random tables and must produce identical
states.  Run: python tools/k24_walk_gather_probe.py [B] [rounds] [reps]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
N = 23  # K-1
W = (1 << N) // 32

rng = np.random.default_rng(0)
f4 = jnp.asarray(rng.integers(0, 2**32, size=(ROUNDS, 4, B, W), dtype=np.uint32))
state0 = jnp.asarray(rng.integers(0, 1 << N, size=(B,), dtype=np.int32))


def walk_scalar(f4, state0):
    states = list(state0)
    for p in range(ROUNDS - 1, -1, -1):
        for b in range(B):
            s = states[b]
            word = jax.lax.dynamic_slice(
                f4, (p, s & 3, b, (s >> 5).astype(jnp.int32)), (1, 1, 1, 1)
            ).reshape(())
            F = ((word >> (((s >> 2) & 7) * 4).astype(jnp.uint32))
                 & jnp.uint32(0xF)).astype(jnp.int32)
            states[b] = (s >> 4) | (F << (N - 4))
    return jnp.stack(states)


FLAT = f4.reshape(ROUNDS, -1)
boff = jnp.arange(B, dtype=jnp.int32) * W


def walk_gather(flat, state0):
    s = state0
    for p in range(ROUNDS - 1, -1, -1):
        idx = (s & 3) * (B * W) + boff + (s >> 5)
        words = jnp.take(flat[p], idx)  # [B]
        F = ((words >> (((s >> 2) & 7) * 4).astype(jnp.uint32))
             & jnp.uint32(0xF)).astype(jnp.int32)
        s = (s >> 4) | (F << (N - 4))
    return s


def walk_gather_loop(flat, state0):
    def body(i, s):
        p = ROUNDS - 1 - i
        idx = (s & 3) * (B * W) + boff + (s >> 5)
        words = jnp.take(flat[p], idx)
        F = ((words >> (((s >> 2) & 7) * 4).astype(jnp.uint32))
             & jnp.uint32(0xF)).astype(jnp.int32)
        return (s >> 4) | (F << (N - 4))
    return jax.lax.fori_loop(0, ROUNDS, body, state0)


def bench(name, fn, *args):
    f = jax.jit(fn)

    def sync(o):
        # scalar host fetch: block_until_ready acks early on this rig
        np.asarray(jax.tree.leaves(o)[0].reshape(-1)[-1:])
        return o

    out = sync(f(*args))
    best = min(
        (lambda t0: (sync(f(*args)),
                     time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(REPS))
    print(f"{name:14s} {best*1e6:9.1f} us  ({best*1e6/ROUNDS:7.2f} us/round)")
    return out


print(f"platform={jax.devices()[0].platform} B={B} rounds={ROUNDS}")
a = bench("scalar", walk_scalar, f4, state0)
if os.environ.get("WALK_PROBE_GATHER", "0") == "1":
    b = bench("gather", walk_gather, FLAT, state0)
    c = bench("gather_loop", walk_gather_loop, FLAT, state0)
    print("agree:", bool(jnp.array_equal(a, b)), bool(jnp.array_equal(a, c)))
