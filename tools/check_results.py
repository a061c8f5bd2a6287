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
   (K=9 <= 1.2x K=7 -- more state words per step can't be faster);
6. every published ``tpu_pallas*`` cell MECHANICALLY beats its comparison
   column in the reference's best-machine tables (VERDICT r3 #1: round 3's
   hand-written "all other cells beat the reference" sentence was false for
   four ``tpu_jnp`` cells, and the gate never opened BASELINE.md -- now the
   baseline lives *in* the gate).  Comparison columns per family: soft8 and
   hard8 rows vs the BEST column, ``_ob`` rows vs the reference's ka9q
   column (the offset-binary family match, ref: src/viterbi_configs.h:15-20),
   ``_s16`` rows vs the best u16 column (ref: RESULTS.md:15-30 u16 columns).
   ``tpu_jnp*`` cells may lose -- but the published RESULTS.md must
   enumerate exactly the losing set (``losing_cells`` feeds
   tools/make_results.py, and tests/test_results_quality.py pins RESULTS.md
   to the regenerated text, so the claim prose cannot drift from the data).

Exit 0 = claim-grade; nonzero prints every violation.  Run after every
matrix refresh: ``python tools/check_results.py data/benchmark.json``.
"""

import argparse
import json
import math
import os
import sys

FLOOR_NS = 1_000
# HBM roofline: device-derived when a TPU is attached, else the v5e figure
# the published matrix was measured on (utils/chipinfo.py).
try:
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from ka9q_viterbi_comparison_tpu.utils.chipinfo import chip_info

    HBM_BYTES_PER_S = chip_info().hbm_bytes_per_s
except Exception:  # gate must stay runnable standalone
    HBM_BYTES_PER_S = 819e9
MAX_REL_STD = 0.15

# ---------------------------------------------------------------------------
# Reference baseline: AMD 7735HS / clang 16, the reference's best machine
# (BASELINE.md:19-39, transcribed from /root/reference/RESULTS.md:10-30).
# Units: update sym/s, chainback bit/s; keys are (K, R); values are the six
# published columns.  "---" cells (no ka9q decoder for R=1/4 codes, no SPIRAL
# K=24) are simply absent.
COLUMNS = ("ka9q", "spiral", "sse_u8", "avx_u8", "sse_u16", "avx_u16")

BASELINE_UPDATE = {
    (7, 2):  {"ka9q": 465e6, "spiral": 457e6, "sse_u8": 553e6,
              "avx_u8": 485e6, "sse_u16": 321e6, "avx_u16": 406e6},
    (7, 4):  {"spiral": 589e6, "sse_u8": 922e6, "avx_u8": 952e6,
              "sse_u16": 476e6, "avx_u16": 774e6},
    (9, 2):  {"ka9q": 152e6, "spiral": 137e6, "sse_u8": 167e6,
              "avx_u8": 248e6, "sse_u16": 79.1e6, "avx_u16": 136e6},
    (9, 4):  {"spiral": 198e6, "sse_u8": 242e6, "avx_u8": 361e6,
              "sse_u16": 120e6, "avx_u16": 210e6},
    (15, 6): {"ka9q": 3.19e6, "spiral": 3.5e6, "sse_u8": 3.31e6,
              "avx_u8": 5.7e6, "sse_u16": 2.13e6, "avx_u16": 3.81e6},
    (24, 2): {"ka9q": 1.09e3, "sse_u8": 2.57e3, "avx_u8": 2.82e3,
              "sse_u16": 1.09e3, "avx_u16": 1.13e3},
}

BASELINE_CHAINBACK = {
    (7, 2):  {"ka9q": 509e6, "spiral": 475e6, "sse_u8": 867e6,
              "avx_u8": 876e6, "sse_u16": 875e6, "avx_u16": 872e6},
    (7, 4):  {"spiral": 474e6, "sse_u8": 871e6, "avx_u8": 861e6,
              "sse_u16": 877e6, "avx_u16": 876e6},
    (9, 2):  {"ka9q": 448e6, "spiral": 469e6, "sse_u8": 388e6,
              "avx_u8": 396e6, "sse_u16": 389e6, "avx_u16": 389e6},
    (9, 4):  {"spiral": 471e6, "sse_u8": 391e6, "avx_u8": 395e6,
              "sse_u16": 393e6, "avx_u16": 396e6},
    (15, 6): {"ka9q": 91.5e6, "spiral": 93e6, "sse_u8": 88.2e6,
              "avx_u8": 90.9e6, "sse_u16": 86.4e6, "avx_u16": 87.5e6},
    (24, 2): {"ka9q": 3.41e6, "sse_u8": 3.68e6, "avx_u8": 3.51e6,
              "sse_u16": 3.58e6, "avx_u16": 3.62e6},
}


def comparison_for(name: str, K: int, R: int, phase: str):
    """The reference cell a published row is claimed against.

    Returns ``(value, label)`` or ``None`` when the reference has no number
    for this (family, K, R) or the row is not a claim row (cpu_native is the
    documented directional-only oracle column).
    """
    table = BASELINE_UPDATE if phase == "update" else BASELINE_CHAINBACK
    cols = table.get((K, R))
    if cols is None or not name.startswith("tpu_"):
        return None
    if name.endswith("_ob"):
        if "ka9q" not in cols:
            return None
        return cols["ka9q"], "ka9q"
    if name.endswith("_s16"):
        sub = {c: v for c, v in cols.items() if c.endswith("_u16")}
    else:  # soft8 / hard8 rows claim against the best column outright
        sub = cols
    label, value = max(sub.items(), key=lambda kv: kv[1])
    return value, label


def mean_rate(r: dict, phase: str) -> float:
    """Mean per-sample rate, the tabulator's estimator
    (scripts/tabulate_data.py fmt over sample_loader rates)."""
    ns = r[f"{phase}_ns"]
    total = (r["total_output_symbols"] if phase == "update"
             else r["total_input_bytes"] * 8)
    return sum(total / (x * 1e-9) for x in ns) / len(ns)


def vs_baseline_rows(rows: list[dict]) -> list[dict]:
    """Per published tpu_* row: measured rates, comparison cells, ratios."""
    out = []
    for r in rows:
        if not r["name"].startswith("tpu_"):
            continue
        entry = {"name": r["name"], "K": r["K"], "R": r["R"]}
        for phase in ("update", "chainback"):
            cmp = comparison_for(r["name"], r["K"], r["R"], phase)
            if cmp is None:
                continue
            base, label = cmp
            rate = mean_rate(r, phase)
            entry[phase] = {"rate": rate, "baseline": base,
                            "column": label, "ratio": rate / base}
        out.append(entry)
    return out


def losing_cells(rows: list[dict]) -> list[str]:
    """Every published tpu_* cell that does NOT beat its comparison column.

    make_results.py embeds this enumeration in RESULTS.md so the prose is
    generated from the data; check() turns any *pallas* member of this list
    into a gate failure.
    """
    out = []
    for e in vs_baseline_rows(rows):
        for phase in ("update", "chainback"):
            if phase in e and e[phase]["ratio"] < 1.0:
                out.append(
                    f"{e['name']} K={e['K']} R={e['R']} {phase} "
                    f"({e[phase]['ratio']:.2f}x the reference {e[phase]['column']} column)")
    return out


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

    # Rule 6: the performance claim is the pallas route -- every published
    # pallas cell must beat its reference comparison column, mechanically.
    for cell in losing_cells(rows):
        if cell.startswith("tpu_pallas"):
            problems.append(f"claim violation: {cell} -- a pallas cell "
                            f"may not lose to its baseline column")
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
