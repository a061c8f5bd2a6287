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
PUSH = int(sys.argv[2]) if len(sys.argv) > 2 else 2048   # trellis steps/push
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
    outs = []
    # warm-up push compiles the (static-shape) update + walk
    outs.append(dec.push(syms[:, :PUSH]))
    jax.block_until_ready(dec.metrics)
    t0 = time.perf_counter()
    for i in range(1, NPUSH):
        outs.append(dec.push(syms[:, i * PUSH : (i + 1) * PUSH]))
    jax.block_until_ready(dec.metrics)
    dt = time.perf_counter() - t0
    nsym = B * PUSH * (NPUSH - 1) * code.R
    rate = nsym / dt
    out = jnp.concatenate(outs, axis=1)
    # decoded prefix must match the transmitted bits
    n_ok = out.shape[1]
    errs = int(jnp.sum(out.astype(jnp.int32) != bits[:, :n_ok]))
    print(f"{backend:6s} sustained {rate/1e9:6.3f} Gsym/s "
          f"({dt*1e3/ (NPUSH-1):6.2f} ms/push)  prefix_errs={errs}")
    return rate


r_pl = run("auto")
r_jnp = run("jnp")
print(f"pallas/jnp = {r_pl / r_jnp:.2f}x ; vs batch 6.19G = {r_pl/6.19e9:.2f}x")
