"""Marginal timing of build_plane_tables with ALL outputs live.

The per-call probes pay ~25 ms of axon host-readback RTT, and naive
feedback chains let XLA dead-code whole table levels; this harness chains
k repacks inside one jit with every output XOR-folded into the carry, so
the marginal prices exactly what the bench's update phase pays.

Run: python tools/repack_marginal.py [B] [T] [k]
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

from ka9q_viterbi_comparison_tpu.configs import VITERBI224
from ka9q_viterbi_comparison_tpu.ops import radix_planes as rp

code = VITERBI224
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
T = int(sys.argv[2]) if len(sys.argv) > 2 else 87
K_CHAIN = int(sys.argv[3]) if len(sys.argv) > 3 else 5
ANCHOR = code.K - 1
W = code.num_states // 32
rng = np.random.default_rng(0)
words = jnp.asarray(rng.integers(0, 2**32, size=(T, B, W), dtype=np.uint32))


def xfold(t, arr):
    """XOR-fold ``arr`` (any [n, ..., B, W]) into a [T, B, W] carry shape."""
    a = arr.reshape(-1, B, W)
    n = a.shape[0]
    reps = -(-T // n)
    return jnp.tile(a, (reps, 1, 1))[:T] ^ t


MAX_WIDTH = int(os.environ.get("RP_MAX_WIDTH", str(rp.W_WALK)))


def step(w):
    tabs = rp.build_plane_tables.__wrapped__(code, w, ANCHOR, None, MAX_WIDTH)
    out = w
    for key in sorted(tabs):
        out = xfold(out, tabs[key])
    return out


def chain(k):
    @jax.jit
    def run(w):
        return jax.lax.fori_loop(0, k, lambda _, c: step(c), w)
    return run


def tmed(fn, *a, n=7):
    def sync(x):
        np.asarray(x[..., -1:])
    sync(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


t1 = tmed(chain(1), words)
tk = tmed(chain(K_CHAIN), words)
marg = (tk - t1) / (K_CHAIN - 1)
print(f"B={B} T={T} k={K_CHAIN}: t1={t1:.1f} ms  tk={tk:.1f} ms  "
      f"repack marginal {marg:.1f} ms", flush=True)
