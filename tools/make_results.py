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
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> None:
    p = argparse.ArgumentParser("make_results")
    p.add_argument("filename", nargs="?", default="data/benchmark.json")
    p.add_argument("--chip-name", default="TPU v5e (1 chip)")
    p.add_argument("--out", default="RESULTS.md")
    args = p.parse_args()

    from contextlib import redirect_stdout

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

Known structural exception: the K=24 chainback phase. Its traceback needs one
4-byte word per frame per step at a data-dependent offset in a 1 MiB decision
row. The best formulation on this platform (per-frame `dynamic_slice`)
measures ~1.2 µs per dependent fetch, serialized by XLA's sequential
schedule, giving ~0.64 Mbit/s at any batch — the measured platform floor
(the only parallel-fetch primitive, a Pallas async copy from HBM, does not
compile on this toolchain; `tools/k24_cb_probe2.py`, and speculative
traceback — fetching the 2^j candidate words whose addresses are pure
functions of the block-entry state — is bit-exact but 3x slower, since
every fetch pays the same per-op overhead; `tools/k24_cb_probe4.py`). The
reference's CPU wins this single phase (3.4 M); it is ~100x cheaper than
the K=24 symbol update in absolute terms, so end-to-end K=24 decode remains
faster here.

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
