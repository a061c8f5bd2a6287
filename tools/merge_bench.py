#!/usr/bin/env python
"""Merge benchmark JSON files row-wise.

Later files override earlier ones on the (name, K, R) key; rows that only
parse partially (a run killed mid-write) are dropped.  Output keeps the
reference emitter's one-object-per-line layout (ref: src/main.cpp:80-118) so
diffs stay reviewable.

Usage: python tools/merge_bench.py out.json part1.json part2.json ...
"""

import json
import sys


def load_rows(path):
    txt = open(path).read().strip()
    try:
        return json.loads(txt)
    except json.JSONDecodeError:
        rows = []
        for line in txt.splitlines():
            line = line.strip().rstrip(",")
            if not line.startswith("{"):
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                print(f"drop partial row in {path}: {line[:60]}...",
                      file=sys.stderr)
        return rows


def main() -> None:
    out_path, *parts = sys.argv[1:]
    merged: dict = {}
    for p in parts:
        for row in load_rows(p):
            merged[(row["name"], row["K"], row["R"])] = row
    # Matrix order: config-major (K asc, R asc per the reference's run order),
    # then family order within a config.
    fam = ["tpu_pallas", "tpu_jnp", "cpu_native",
           "tpu_pallas_s16", "tpu_jnp_s16", "cpu_native_s16",
           "tpu_pallas_ob", "tpu_jnp_ob", "cpu_native_ob"]
    rows = sorted(merged.values(),
                  key=lambda r: (r["K"], r["R"], fam.index(r["name"])))
    with open(out_path, "w") as f:
        f.write("[\n")
        f.write(",\n".join(json.dumps(r) for r in rows))
        f.write("\n]\n")
    print(f"{len(rows)} rows -> {out_path}")


if __name__ == "__main__":
    main()
