#!/usr/bin/env python
"""Pick the K=24 matrix batch: full phase bench (update incl. radix-plane
repack, plane-walk chainback) at several batches through the real
harness methodology (harness.bench.run_phase_bench), soft8 family.

VERDICT r3 #3: kernel-only batch scaling at depth 2 was flat, but the
depth-4 kernel and the traceback's cross-frame pipelining both favour
larger batches; the published matrix should run whatever wins END TO END.

Run: python tools/k24_batch_pick.py [B ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ka9q_viterbi_comparison_tpu import VITERBI224, soft8_spec
from ka9q_viterbi_comparison_tpu.harness.bench import run_phase_bench
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames

LOG = lambda *a: print(*a, flush=True)

code = VITERBI224
numeric = soft8_spec(code.R)
N_BYTES = 8  # the reference's ICE frame size

if __name__ == "__main__":
    batches = [int(b) for b in (sys.argv[1:] or ["4", "8", "16"])]
    rng = np.random.default_rng(0)
    for B in batches:
        data = rng.integers(0, 256, size=(B, N_BYTES), dtype=np.uint8)
        syms = jax.block_until_ready(
            encode_frames(code, numeric, jnp.asarray(data)))
        r = run_phase_bench(code, numeric, data, syms, name="tpu_pallas",
                            backend="pallas", sampling_time=0.5,
                            minimum_samples=5)
        obj = r.to_json_obj()
        up = np.asarray(obj["update_ns"], float)
        cb = np.asarray(obj["chainback_ns"], float)
        up_rate = np.mean(obj["total_output_symbols"] / (up * 1e-9))
        cb_rate = np.mean(obj["total_input_bytes"] * 8 / (cb * 1e-9))
        LOG(f"B={B}: update {up_rate/1e3:8.2f} ksym/s  "
            f"chainback {cb_rate/1e6:7.2f} Mbit/s  BER {obj['bit_error_rate']}")
    LOG("ALL DONE")
