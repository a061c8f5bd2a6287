#!/usr/bin/env python
"""Measured streaming throughput (VERDICT r4 item 5 "done" criterion).

Drives ``StreamingDecoder`` on the real chip at K=7 bench batch with the
dispatch-routed (Pallas) update and reports sustained symbols/s over a
long stream, vs the batch pallas update rate for context (RESULTS.md:
6.19 Gsym/s at B=512).

Run: python tools/streaming_probe.py [B] [push_steps] [n_pushes]
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

from ka9q_viterbi_comparison_tpu.configs import VITERBI27, soft8_spec
from ka9q_viterbi_comparison_tpu.models.streaming import StreamingDecoder
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_bits
from ka9q_viterbi_comparison_tpu.utils.bits import bytes_to_bits

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
PUSH = int(sys.argv[2]) if len(sys.argv) > 2 else 2046   # steps/push; a multiple of K-1 keeps one steady program
NPUSH = int(sys.argv[3]) if len(sys.argv) > 3 else 32

code, numeric = VITERBI27, soft8_spec(2)
rng = np.random.default_rng(0)
print(f"platform={jax.devices()[0].platform} B={B} push={PUSH} n={NPUSH}")

# one long random bit stream per frame lane (no tail until the end)
data = rng.integers(0, 256, size=(B, PUSH * NPUSH // 8), dtype=np.uint8)
bits = bytes_to_bits(jnp.asarray(data))
enc = encode_bits(code, bits)  # [B, T + K-1, R]
T = PUSH * NPUSH
sym_hi, sym_lo = numeric.soft_high, numeric.soft_low
syms = jnp.where(enc.astype(bool), jnp.int32(sym_hi), jnp.int32(sym_lo))


def run(backend):
    dec = StreamingDecoder(code, numeric, batch=B, backend=backend)
    def syncfetch():
        # scalar host fetch: block_until_ready can acknowledge before
        # execution completes on this transport (harness/bench.py sync())
        np.asarray(dec.metrics[:1, :1])

    outs = []
    # warm-up pushes compile the steady-state program (first two shapes
    # differ: empty history, then the steady window)
    outs.append(dec.push(syms[:, :PUSH]))
    outs.append(dec.push(syms[:, PUSH : 2 * PUSH]))
    syncfetch()
    t0 = time.perf_counter()
    for i in range(2, NPUSH):
        outs.append(dec.push(syms[:, i * PUSH : (i + 1) * PUSH]))
    syncfetch()
    dt = time.perf_counter() - t0
    nsym = B * PUSH * (NPUSH - 2) * code.R
    rate = nsym / dt
    out = jnp.concatenate(outs, axis=1)
    # decoded prefix must match the transmitted bits
    n_ok = out.shape[1]
    errs = int(jnp.sum(out.astype(jnp.int32) != bits[:, :n_ok]))
    print(f"{backend:6s} sustained {rate/1e9:6.3f} Gsym/s "
          f"({dt*1e3/ (NPUSH-2):6.2f} ms/push)  prefix_errs={errs}")
    return rate


r_pl = run("auto")
r_jnp = run("jnp")
print(f"pallas/jnp = {r_pl / r_jnp:.2f}x ; vs batch 6.19G = {r_pl/6.19e9:.2f}x")


def run_chained(backend, ks=(4, 16)):
    """Device-side steady-state throughput: k pushes inside ONE jitted
    scan (the interactive numbers above are bound by this dev rig's
    ~15 ms per-dispatch transport RTT; production streaming overlaps or
    batches pushes, and a local chip's dispatch is ~100 us)."""
    dec = StreamingDecoder(code, numeric, batch=B, backend=backend)
    dec.push(syms[:, :PUSH])
    dec.push(syms[:, PUSH : 2 * PUSH])  # reach the steady shape
    nrot = code.K - 1
    assert PUSH % nrot == 0, "phase-aligned pushes give one steady program"
    key = (PUSH, dec.history.shape[1],
           PUSH, dec.abs_step % nrot, dec.steps_emitted % nrot, 0)
    steady = dec._push_cache.get(key) or dec._build_push(*key)

    kav = (syms.shape[1] - 2 * PUSH) // PUSH
    sym_blocks = (syms[:, 2 * PUSH : (2 + kav) * PUSH]
                  .reshape(B, kav, PUSH, code.R))
    sym_blocks = jnp.swapaxes(sym_blocks, 0, 1)  # [k_avail, B, PUSH, R]

    def chain(k):
        @jax.jit
        def go(m, hist, blocks):
            def body(carry, sym):
                m, h = carry
                m, h, out = steady(m, h, sym)
                return (m, h), out[:, -1]
            (m, h), outs = jax.lax.scan(body, (m, hist), blocks[:k])
            return m, h, outs
        return go

    import time as _t
    m0, h0 = dec.metrics, dec.history
    times = {}
    for k in ks:
        g = chain(k)
        np.asarray(g(m0, h0, sym_blocks)[0][:1, :1])  # compile+run
        best = min(
            (lambda t0: (np.asarray(g(m0, h0, sym_blocks)[0][:1, :1]),
                         _t.perf_counter() - t0)[1])(_t.perf_counter())
            for _ in range(5))
        times[k] = best
    per_push = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
    rate = B * PUSH * code.R / per_push
    print(f"{backend:6s} chained device-side {rate/1e9:6.3f} Gsym/s "
          f"({per_push*1e3:6.2f} ms/push) vs batch 6.19G = {rate/6.19e9:.2f}x")


run_chained("auto")
run_chained("jnp")
