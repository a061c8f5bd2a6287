#!/usr/bin/env python
"""Claim-grade gate for a benchmark JSON (VERDICT r2 #2).

The reference's RESULTS.md tables are claim-grade numbers
(ref: RESULTS.md:10-30); this repo's round-2 matrix shipped estimator
artifacts (a floored sample tabulating as an impossible 137 Gbit/s
chainback).  This checker encodes the acceptance criteria so a bad matrix
can never be published silently again:

1. no raw update/chainback sample sits on the 1 us resolution floor
   (harness/bench.py emits the floor only after its growth budget is
   exhausted -- an occurrence in a published phase means it was
   unmeasurable; init legitimately floors: a jitted metric reset is
   sub-us, unlike the reference's 16 MiB memset, and no init rate is
   published);
2. every published claim row -- update and chainback of the tpu_* families,
   the ones compared against BASELINE.md -- has std/mean <= 15 %
   (init is a sub-ms bookkeeping phase and cpu_native is the documented
   directional-only oracle column; both stay BER- and floor-gated only);
3. no chainback rate implies traffic beyond the HBM roofline
   (K <= 15 batched walks stream W = 2^(K-1)/32 words x 4 B per frame-bit;
   the K=24 plane walk fetches one word per W_WALK steps);
4. BER is exactly 0 for every noiseless row;
5. chainback does not speed up as the trellis grows within a backend
   (K=9 <= 1.2x K=7 -- more state words per step can't be faster).

Exit 0 = claim-grade; nonzero prints every violation.  Run after every
matrix refresh: ``python tools/check_results.py data/benchmark.json``.
"""

import argparse
import json
import math
import os
import sys

FLOOR_NS = 1_000
HBM_BYTES_PER_S = 819e9
MAX_REL_STD = 0.15


def check(path: str) -> list[str]:
    from ka9q_viterbi_comparison_tpu.ops.radix_planes import W_WALK

    with open(path) as f:
        rows = json.load(f)
    problems: list[str] = []
    cb_rate: dict[tuple[str, int], float] = {}
    for r in rows:
        name, K = r["name"], r["K"]
        tag = f"{name} K={K} R={r['R']}"
        for phase in ("update", "chainback"):
            ns = r[f"{phase}_ns"]
            floored = sum(1 for x in ns if x <= FLOOR_NS)
            if floored:
                problems.append(f"{tag}: {floored}/{len(ns)} {phase} samples "
                                f"on the {FLOOR_NS} ns floor")
            if not name.startswith("tpu_"):
                continue  # claim rows only (see module docstring)
            mu = sum(ns) / len(ns)
            sd = math.sqrt(sum((x - mu) ** 2 for x in ns) / len(ns))
            if mu > 0 and sd / mu > MAX_REL_STD:
                problems.append(f"{tag}: {phase} std {sd/mu:.0%} > "
                                f"{MAX_REL_STD:.0%} of mean")
        if r["bit_error_rate"] != 0:
            problems.append(f"{tag}: nonzero BER {r['bit_error_rate']}")

        cb_ns = sum(r["chainback_ns"]) / len(r["chainback_ns"])
        rate = r["total_input_bytes"] * 8 / (cb_ns * 1e-9)  # aggregate bit/s
        W = max(1, (1 << (K - 1)) // 32)
        bytes_per_bit = W * 4 if K <= 15 else 4 / W_WALK
        if rate * bytes_per_bit > HBM_BYTES_PER_S:
            problems.append(
                f"{tag}: chainback {rate/1e9:.3g} Gbit/s x {bytes_per_bit} "
                f"B/bit exceeds the {HBM_BYTES_PER_S/1e9:.0f} GB/s HBM roofline")
        backend = name
        if K in (7, 9) and r["R"] == 2:
            cb_rate[(backend, K)] = rate

    for backend in {b for b, _ in cb_rate}:
        k7, k9 = cb_rate.get((backend, 7)), cb_rate.get((backend, 9))
        if k7 and k9 and k9 > 1.2 * k7:
            problems.append(
                f"{backend}: K=9 chainback ({k9/1e9:.3g} G) implausibly beats "
                f"K=7 ({k7/1e9:.3g} G) by >1.2x (4x the words/step)")
    return problems


def main() -> None:
    p = argparse.ArgumentParser("check_results")
    p.add_argument("filename", nargs="?", default="data/benchmark.json")
    args = p.parse_args()
    problems = check(args.filename)
    if problems:
        for x in problems:
            print(f"FAIL {x}")
        sys.exit(1)
    print(f"OK {args.filename}: claim-grade (no floored samples, stds <= "
          f"{MAX_REL_STD:.0%}, rooflines respected, BER 0)")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
