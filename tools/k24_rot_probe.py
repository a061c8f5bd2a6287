"""Probe: K=24 portable-jnp symbol update, natural vs rotating addressing.

The natural-order `lax.scan` body interleaves the [B, S] metric tensor at
element granularity every trellis step; RESULTS.md carries this as the one
losing cell (~0.3 ksym/s vs the reference's scalar ka9q column at 1.09 k,
BASELINE.md:29).  `ops.acs.acs_update_rotating` removes the interleave with
the in-place address rotation (block-granularity stride for 22 of 23
phases).  This probe times both on the real chip at the reference's K=24
frame size (8 bytes -> T=87, ref: src/main.cpp:411-418) and the benchmark
batch (B=4, harness/runner.py DEFAULT_BATCH).

MEASURED OUTCOME (v5e, round 4) -- negative, the rotating route is
unroutable for K=24 jnp on this rig:

* B=4 (the benchmark batch): XLA compile fails with a permanent HBM OOM --
  "Ran out of memory in memory space hbm. Used 16.48G of 15.75G", program
  alone 16.35G.  The rotating gathers materialise per-phase permutation
  temps of the [B, S] = 128 MiB metric tensor across the 23-phase cycle
  inside the scan body, and XLA's buffer assignment keeps enough of them
  live to exceed the chip.
* B=1: compilation does not complete within a 20-minute budget (killed).

So `acs_update_rotating` stays an un-routed portability experiment at
K=24; the jnp family keeps the natural-order scan and the K=24 jnp cells
remain in RESULTS.md's generated losing-cell list (the pallas route is the
performance path for this config).  The rotating formulation IS the right
trick where the metric vector is VMEM-resident -- ops/pallas/inplace.py
applies it in-kernel for K <= 15.

Run: python tools/k24_rot_probe.py [--iters N] [--bytes N] [--batch N]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from ka9q_viterbi_comparison_tpu import VITERBI224, soft8_spec
from ka9q_viterbi_comparison_tpu.ops import acs, chainback as cb
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames


def time_fn(fn, *args, iters):
    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    return dt, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--bytes", type=int, default=8)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--skip-natural", action="store_true")
    args = p.parse_args()

    code, numeric = VITERBI224, soft8_spec(2)
    B, nb = args.batch, args.bytes
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(B, nb), dtype=np.uint8)
    syms = jax.block_until_ready(
        encode_frames(code, numeric, jnp.asarray(data))
        .reshape(B, -1, code.R).astype(jnp.int32))
    T = syms.shape[1]
    m0 = jax.block_until_ready(acs.init_metrics(code, numeric, B))
    n_sym = B * T * code.R
    print(f"platform={jax.devices()[0].platform} B={B} T={T} syms/call={n_sym}")

    dt_r, (m_rot, w_rot, _) = time_fn(
        lambda m, s: acs.acs_update_rotating(code, numeric, m, s, 0),
        m0, syms, iters=args.iters)
    print(f"rotating: {dt_r*1e3:9.1f} ms/call  {n_sym/dt_r:10.1f} sym/s")
    out = cb.chainback(code, w_rot, nb * 8, 0, True)
    ok_rot = np.array_equal(np.asarray(out), data)
    print(f"rotating decode exact: {ok_rot}")

    if not args.skip_natural:
        dt_n, (m_nat, _, _) = time_fn(
            lambda m, s: acs.acs_update(code, numeric, m, s, True),
            m0, syms, iters=args.iters)
        print(f"natural:  {dt_n*1e3:9.1f} ms/call  {n_sym/dt_n:10.1f} sym/s")
        print(f"speedup: {dt_n/dt_r:.2f}x  metrics equal: "
              f"{bool(jnp.array_equal(m_nat, m_rot))}")


if __name__ == "__main__":
    main()
