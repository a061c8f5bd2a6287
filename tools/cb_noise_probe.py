"""Debug the noisy K=9 chainback marginals (RESULTS rows 15.6+-4.4G, 137+-340G).

Runs run_phase_bench for viterbi49/viterbi29 pallas and prints the sized
chain lengths plus per-sample phase times so the failure mode is visible.
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from ka9q_viterbi_comparison_tpu.configs import VITERBI29, VITERBI49, soft8_spec
from ka9q_viterbi_comparison_tpu.harness import bench
from ka9q_viterbi_comparison_tpu.ops.encoder import encode_frames

# Monkeypatch a trace into _size_chain results by wrapping run_phase_bench's
# internals: simplest is to re-run with instrumented module-level prints.
orig_size = bench.run_phase_bench


def main() -> None:
    code = VITERBI49 if len(sys.argv) < 2 or sys.argv[1] == "49" else VITERBI29
    numeric = soft8_spec(code.R)
    B, n_bytes = (256 if code is VITERBI49 else 512), 512
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
    symbols = jax.block_until_ready(encode_frames(code, numeric, jnp.asarray(data)))
    res = bench.run_phase_bench(code, numeric, data, symbols,
                                name="probe", backend="pallas",
                                sampling_time=1.0, minimum_samples=8)
    cb = np.array([s.chainback_ns for s in res.samples], dtype=np.float64)
    up = np.array([s.update_ns for s in res.samples], dtype=np.float64)
    total_bits = B * n_bytes * 8
    print(f"code={code.name} B={B} bytes={n_bytes}")
    print("chainback ns samples:", cb.astype(int).tolist())
    print("update ns samples:", up.astype(int).tolist())
    rate = total_bits / (cb * 1e-9)
    print(f"chainback rate mean={rate.mean()/1e9:.3g}G std={rate.std()/1e9:.3g}G")
    print(f"per-bit ns: {cb.mean()/total_bits*1e3:.3f} ps*1e3")


if __name__ == "__main__":
    main()
