#!/usr/bin/env python
"""Tabulate benchmark JSON into the reference's markdown format
(update symbol rate and chainback bit rate, mean±std; metric definitions
ref: scripts/tabulate_data.py:33, :54)."""

from __future__ import annotations

import argparse

import numpy as np

from sample_loader import load_samples
from util import si_scale, unique


def fmt(values: np.ndarray) -> str:
    avg, std = float(np.mean(values)), float(np.std(values))
    prefix, scale = si_scale(avg)
    return f"{avg / scale:.3g}±{std / scale:.2g}{prefix}"


def print_table(title: str, samples, metric) -> None:
    names = list(unique(s.name for s in samples))
    kr_list = list(unique((s.K, s.R) for s in samples))
    print(f"## {title}")
    print("| K | R | {0} |".format(" | ".join(names)))
    print("| {0} |".format(" | ".join(["---"] * (len(names) + 2))))
    for K, R in kr_list:
        by_name = {s.name: s for s in samples if (s.K, s.R) == (K, R)}
        cells = [fmt(metric(by_name[n])) if n in by_name else "---" for n in names]
        print(f"| {K} | {R} | {' | '.join(cells)} |")


def main() -> None:
    p = argparse.ArgumentParser("tabulate_data", description="Tabulate benchmark data")
    p.add_argument("filename", nargs="?", default="./data/benchmark.json")
    args = p.parse_args()
    samples = load_samples(args.filename)
    print_table("Update symbol rate", samples, lambda s: s.update_symbol_rate)
    print()
    print_table("Chainback bit rate", samples, lambda s: s.chainback_bit_rate)


if __name__ == "__main__":
    main()
