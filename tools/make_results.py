#!/usr/bin/env python
"""Generate RESULTS.md + docs plots from a benchmark JSON
(the repo's analogue of the reference's RESULTS.md tables and docs PNGs,
ref: RESULTS.md, scripts/plot_data.py outputs)."""

import argparse
import io
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # package import for tools/check_results.py
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> None:
    p = argparse.ArgumentParser("make_results")
    p.add_argument("filename", nargs="?", default="data/benchmark.json")
    p.add_argument("--chip-name", default="TPU v5e (1 chip)")
    p.add_argument("--out", default="RESULTS.md")
    args = p.parse_args()

    from contextlib import redirect_stdout

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import check_results  # noqa: E402  (tools/)

    problems = check_results.check(args.filename)
    if problems:
        for x in problems:
            print(f"FAIL {x}", file=sys.stderr)
        sys.exit(f"{args.filename} is not claim-grade; fix the run first")

    import tabulate_data  # noqa: E402  (scripts/)

    buf = io.StringIO()
    with redirect_stdout(buf):
        sys.argv = ["tabulate_data", args.filename]
        tabulate_data.main()
    tables = buf.getvalue()

    header = f"""# Results — {args.chip_name}

Benchmark of the TPU-native decoder families over the reference's six-config
matrix (frame sizes per config as in the reference harness).  Metric
definitions match the reference's analysis scripts: update symbol rate =
total_output_symbols / update_ns; chainback bit rate = total_input_bytes*8 /
chainback_ns (mean±std over raw per-iteration samples).  One iteration
decodes the whole batch of frames listed in the JSON; phase times subtract
the measured per-call transport overhead of the dev rig (see
harness/bench.py).  Families:

* `tpu_pallas` — fused Pallas kernels (in-place rotating-address VMEM
  kernels for K<=15; state-blocked HBM-streamed for K=24)
* `tpu_jnp`    — portable XLA `lax.scan` path
* `cpu_native` — the C++ host decoder (serial per frame), the in-repo CPU
  baseline.  It runs on this rig's VM cores; compare it against the
  reference's desktop-CPU numbers in BASELINE.md only directionally.
* `*_ob`       — same backends under the ka9q offset-binary {0,255} symbol
  convention (ref: src/viterbi_configs.h:15-20), for the configs the
  reference also runs through its ka9q family (K7/9/15/24 at r=1/2,1/6).

Reference hardware numbers to compare against are in `BASELINE.md`.

Phase-attribution note for K=24: the traceback's plain walk is bound by
dependent-fetch latency (~1.2 µs per 4-byte word per frame per step —
`tools/k24_cb_probe2.py`), so the pallas route retires W_WALK=4 steps per
fetch from nibble-packed radix tables (`ops/radix_planes.py`). Building
those tables is *pre-computation for the traceback but runs (and is timed)
inside the update phase* — the published K=24 update rate already pays the
~45 % repack surcharge, and both phases beat the reference with it
included. The jnp/native columns keep the plain per-step walk.

Reading note — K=9 chainback can tabulate slightly above K=7's (e.g. 12.3
vs 11 Gbit/s): both walks are bound by per-step latency, not word traffic
(ARCHITECTURE.md roofline table), and K=9's bench frames are half as long
(512 vs 1024 bytes) at the same batch, so per-step fixed costs amortise
the same while the two configs sit within ~10 % of each other — inside the
gate's 1.2x plausibility bound, unlike round 2's 28 %-std artifact rows.

Known losing cell — K=24 `tpu_jnp` update (~0.3 k sym/s vs the reference's
scalar ka9q column at 1.09 k): the portable `lax.scan` path materialises
~25 XLA passes of the 134 MiB-per-step metric tensor (measured effective
elementwise bandwidth ~96 GB/s on this rig), and the penalty-sharing
identity only trims a few of them. The pallas column is the performance
route for this config (wins both phases); the jnp column is kept as the
portability/oracle path. All other cells in both tables beat the
reference's best column.

This matrix passed `tools/check_results.py` (no floored samples, claim-row
stds <= 15 %, rooflines respected, BER 0) — the gate is re-run by
`tests/test_results_quality.py` on every suite run.

"""
    with open(os.path.join(REPO, args.out), "w") as f:
        f.write(header + tables)
    print(f"wrote {args.out}")

    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "plot_data.py"),
         args.filename, "--chip-name", args.chip_name,
         "--out-dir", os.path.join(REPO, "docs")],
        check=True,
    )


if __name__ == "__main__":
    main()
