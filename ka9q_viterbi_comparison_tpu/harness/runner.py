"""Benchmark runner: the TPU framework's analogue of the reference binary.

CLI mirrors ``./main -t SECS -n MIN_SAMPLES -o FILE``
(ref: src/main.cpp:300-330) and the emitted JSON keeps the reference's
per-test schema verbatim (ref: print_test, src/main.cpp:80-118) so the
reference's analysis scripts -- and this repo's re-implementations in
``scripts/`` -- work on either implementation's output.

The test matrix is the reference's six configs at its frame sizes
(ref: src/main.cpp:363-419); "decoder families" become TPU backends:

* ``pallas`` -- the fused TPU kernels (VMEM-resident through K=9, the
  state-blocked large-K kernel above; every config).
* ``jnp``    -- the portable XLA scan path (every config).
* ``native`` -- the C++ host decoder (cpu_native), when a toolchain exists.

Progress goes to stderr, samples to the JSON file -- the reference's two
output channels (ref: src/main.cpp:27-31).
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import (
    BENCH_FRAME_BYTES,
    STANDARD_CODES,
    CodeSpec,
    ka9q_offset_binary_spec,
    soft8_spec,
    soft16_spec,
)
from ..ops.encoder import encode_frames
from .bench import run_phase_bench

__all__ = ["main", "run_matrix"]

# Batch sizes per config: the TPU's throughput axis.  Sized so decision
# storage stays comfortably in HBM (K=24's is ~1 MiB per frame per bit).
DEFAULT_BATCH = {
    # Peaks of the in-place rotating-address route (tools/small_sweep.py,
    # chained marginals on v5e): K=7 10.25 G @ 512 (4.99 @ 1024), K=9 1.74 G
    # @ 512, r=1/4 variants measured at the same points.
    "viterbi27": 512,
    "viterbi47": 512,
    "viterbi29": 512,
    "viterbi49": 256,
    "viterbi615": 256,  # VMEM caps the in-place kernel at 256 (tools/inplace_probe.py)
    # K=24 at the paired field-emitting kernels (round-5 harness A/B at
    # KA9Q_TPU_K24_WALK=8): B=8 update 7.6 ksym/s / chainback 14 Mbit/s vs
    # B=16's 7.3 k / 15.4 M — B=8 maximises the update margin and the
    # walk is latency-bound (near-flat in batch).
    "viterbi224": 8,
}


# Frames per iteration for the serial cpu_native family (kept small: it is
# the comparison baseline, not the throughput path).
NATIVE_BATCH = {
    "viterbi27": 8, "viterbi47": 8, "viterbi29": 8, "viterbi49": 8,
    "viterbi615": 2, "viterbi224": 1,
}

# Configs the reference also runs under the ka9q family's offset-binary
# {0, 255} symbol convention (ref: src/viterbi_configs.h:15-20; the R=4 codes
# have no ka9q decoder, ref: src/main.cpp:374-398).
KA9Q_CONFIGS = {"viterbi27", "viterbi29", "viterbi615", "viterbi224"}


def backends_for(code: CodeSpec) -> list[str]:
    from ..ops.pallas import dispatch
    from ..utils import native

    out = []
    if dispatch.on_tpu():
        out.append("pallas")  # K>15 resolves to the state-blocked large_k kernel
    out.append("jnp")
    if native.available():
        out.append("native")
    return out


def run_matrix(
    sampling_time: float,
    minimum_samples: int,
    out_fp,
    codes=STANDARD_CODES,
    batch_override: int | None = None,
    frame_bytes_override: int | None = None,
    seed: int = 0,
    backends: list[str] | None = None,
) -> None:
    rng = np.random.default_rng(seed)
    out_fp.write("[\n")
    first = True
    for code in codes:
        n_bytes = frame_bytes_override or BENCH_FRAME_BYTES[code.name]
        B = batch_override or DEFAULT_BATCH[code.name]
        # Numeric families per config: soft8 (the "ours" soft-decision rows),
        # soft16 (the reference's u16 columns exist for every config,
        # ref: src/viterbi_configs.h:22-35 / RESULTS.md:15-30), plus the ka9q
        # offset-binary convention where the reference has a ka9q column --
        # keeps the family comparison honest.
        numerics = [(soft8_spec(code.R), ""), (soft16_spec(code.R), "_s16")]
        if code.name in KA9Q_CONFIGS:
            numerics.append((ka9q_offset_binary_spec(), "_ob"))
        for numeric, tag in numerics:
            print(f"[{code.name}] K={code.K} R={code.R} bytes={n_bytes} "
                  f"batch={B} numeric={numeric.name}",
                  file=sys.stderr, flush=True)
            data = rng.integers(0, 256, size=(B, n_bytes), dtype=np.uint8)
            symbols = jax.block_until_ready(
                encode_frames(code, numeric, jnp.asarray(data)))
            for backend in (backends or backends_for(code)):
                print(f"- {backend}", file=sys.stderr, flush=True)
                if backend == "native":
                    nb = min(B, NATIVE_BATCH[code.name])
                    b_data, b_syms = data[:nb], symbols[:nb]
                    name = f"cpu_native{tag}"
                else:
                    b_data, b_syms, name = data, symbols, f"tpu_{backend}{tag}"
                result = run_phase_bench(
                    code, numeric, b_data, b_syms,
                    name=name, backend=backend,
                    sampling_time=sampling_time, minimum_samples=minimum_samples,
                )
                ber = result.total_bit_errors / float(result.total_bits)
                print(f"o {backend} ({ber:.3f})", file=sys.stderr, flush=True)
                if not first:
                    out_fp.write(",\n")
                first = False
                json.dump(result.to_json_obj(), out_fp)
    out_fp.write("\n]\n")
    out_fp.flush()


def main(argv=None) -> None:
    # Persistent compilation cache (CLI entry only -- never set as an import
    # side effect): Mosaic compiles through this rig's remote helper take
    # minutes; cached matrix reruns take seconds.
    import os

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    p = argparse.ArgumentParser(
        "run_benchmark",
        description="Benchmark the TPU-native Viterbi decoder families",
    )
    p.add_argument("-t", "--sampling-time", type=float, default=1.0,
                   metavar="SAMPLING_TIME", help="Amount of time to run decoder")
    p.add_argument("-n", "--minimum-samples", type=int, default=8,
                   metavar="MINIMUM_SAMPLES",
                   help="Minimum number of samples to accumulate")
    p.add_argument("-o", "--output", default="./data/benchmark.json",
                   metavar="OUTPUT_FILENAME", help="Filename to output sample data")
    p.add_argument("--codes", nargs="*", default=None,
                   help="Subset of config names (default: all six)")
    p.add_argument("--batch", type=int, default=None, help="Override batch size")
    p.add_argument("--frame-bytes", type=int, default=None,
                   help="Override data bytes per frame")
    p.add_argument("--backends", nargs="*", default=None,
                   choices=["pallas", "jnp", "native"],
                   help="Subset of decoder families (default: all available)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    codes = STANDARD_CODES
    if args.codes:
        by_name = {c.name: c for c in STANDARD_CODES}
        unknown = [n for n in args.codes if n not in by_name]
        if unknown:
            p.error(f"unknown config(s): {unknown}; choose from {sorted(by_name)}")
        codes = tuple(by_name[n] for n in args.codes)

    if args.output == "-":
        run_matrix(args.sampling_time, args.minimum_samples, sys.stdout, codes,
                   args.batch, args.frame_bytes, args.seed, args.backends)
    else:
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        with open(args.output, "w") as f:
            run_matrix(args.sampling_time, args.minimum_samples, f, codes,
                       args.batch, args.frame_bytes, args.seed, args.backends)


if __name__ == "__main__":
    main()
