#!/usr/bin/env python
"""A/B the residue-split scan carry for the K=24 two-step kernel.

KA9Q_TPU_LK2_RESIDUE=1 keeps the metric tensor in the kernel's mod-4
column-residue output representation between pairs (no whole-array XLA
re-interleave per pair -- that re-interleave is an extra HBM read+write of
16 MiB x B per pair, roughly doubling the algorithmic metric traffic);
=0 is the natural-order whole-array carry baseline.

Same quiet-window methodology as tools/k24_sweep.py.
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
from ka9q_viterbi_comparison_tpu.ops.pallas import large_k2

LOG = lambda *a: print(*a, flush=True)

code = VITERBI224
numeric = soft8_spec(code.R)
BATCHES = [int(b) for b in (sys.argv[1:] or ["4", "8"])]
QUIET_MS = float(os.environ.get("QUIET_MS", "6.0"))
MAX_WAIT_S = float(os.environ.get("MAX_WAIT_S", "520"))

rng = np.random.default_rng(0)


def make_full(B, T, residue):
    state = {"m": jnp.zeros((B, code.num_states), jnp.int32), "i": 0}
    syms = [jnp.asarray(rng.integers(0, 7, size=(B, T, code.R)), jnp.int32)
            for _ in range(4)]
    os.environ["KA9Q_TPU_LK2_RESIDUE"] = "1" if residue else "0"
    f = jax.jit(lambda m, s: large_k2.acs_update_large2.__wrapped__(
        code, numeric, m, s, False, "int16"))

    def run():
        m, w, off = f(state["m"], syms[state["i"] % 4])
        state["m"] = m
        state["i"] += 1
        return m, w, off

    np.asarray(run()[0][..., -1:])  # trace now, while the env flag holds
    return run


def t_once(fn):
    t0 = time.perf_counter()
    m, w, off = fn()
    np.asarray(m[..., -1:])
    return time.perf_counter() - t0


canary = make_full(4, 2, True)

cases = []
for B in BATCHES:
    for res in (True, False):
        label = f"B={B} {'residue' if res else 'natural'}"
        cases.append((label, make_full(B, 2, res), make_full(B, 32, res)))
        LOG(f"  compiled {label}")

t_start = time.time()
while True:
    t_c = min(t_once(canary) for _ in range(3)) * 1e3
    if t_c <= QUIET_MS:
        LOG(f"quiet window (canary {t_c:.2f} ms)")
        break
    if time.time() - t_start > MAX_WAIT_S:
        LOG(f"NO QUIET WINDOW (canary {t_c:.2f} ms after {MAX_WAIT_S:.0f}s)")
        sys.exit(2)
    time.sleep(10)

samples = {label: [] for label, _, _ in cases}
for it in range(11):
    for label, short, long in cases:
        ts = min(t_once(short), t_once(short))
        tl = min(t_once(long), t_once(long))
        samples[label].append(max((tl - ts) / 15.0, 1e-9))

for label, _, _ in cases:
    B = int(label.split()[0].split("=")[1])
    v = np.sort(np.array(samples[label]))
    pair_ms = np.median(v) * 1e3
    rate = B * code.R * 2 / np.median(v)
    LOG(f"{label}: pair med {pair_ms:.2f} ms (min {v[0]*1e3:.2f})"
        f" -> {rate/1e3:.2f} ksym/s")
LOG("ALL DONE")
