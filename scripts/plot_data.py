#!/usr/bin/env python
"""Grouped bar charts of update / chainback rates, normalized to a baseline
decoder column (the reference normalizes to its sse_u8 column,
ref: scripts/plot_data.py:24); error bars are std."""

from __future__ import annotations

import argparse
import os

import numpy as np

from sample_loader import load_samples
from util import unique


def plot_metric(samples, metric, title, ylabel, out_path, chip_name, baseline):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(unique(s.name for s in samples))
    if baseline not in names:
        baseline = names[0]
    kr_list = list(unique((s.K, s.R) for s in samples))
    labels = [f"K={K} R={R}" for K, R in kr_list]

    fig, ax = plt.subplots(figsize=(10, 5))
    width = 0.8 / len(names)
    x = np.arange(len(kr_list))
    for i, name in enumerate(names):
        means, stds = [], []
        for K, R in kr_list:
            by_name = {s.name: s for s in samples if (s.K, s.R) == (K, R)}
            base = by_name.get(baseline)
            s = by_name.get(name)
            if s is None or base is None:
                means.append(0.0)
                stds.append(0.0)
                continue
            norm = float(np.mean(metric(base)))
            means.append(float(np.mean(metric(s))) / norm)
            stds.append(float(np.std(metric(s))) / norm)
        ax.bar(x + i * width, means, width, yerr=stds, capsize=2, label=name)
    ax.set_xticks(x + 0.4 - width / 2)
    ax.set_xticklabels(labels)
    ax.set_ylabel(ylabel)
    ax.set_title(f"{title} ({chip_name})")
    ax.legend()
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    print(f"wrote {out_path}")


def main() -> None:
    p = argparse.ArgumentParser("plot_data", description="Plot benchmark data")
    p.add_argument("filename", nargs="?", default="./data/benchmark.json")
    p.add_argument("--chip-name", default="TPU", help="Label for the chart title")
    p.add_argument("--baseline", default="tpu_jnp", help="Column to normalize to")
    p.add_argument("--out-dir", default="./docs")
    args = p.parse_args()

    samples = load_samples(args.filename)
    os.makedirs(args.out_dir, exist_ok=True)
    plot_metric(
        samples, lambda s: s.update_symbol_rate,
        "Symbol update rate (normalized)", "relative rate",
        os.path.join(args.out_dir, "plot_symbol_update.png"),
        args.chip_name, args.baseline,
    )
    plot_metric(
        samples, lambda s: s.chainback_bit_rate,
        "Chainback bit rate (normalized)", "relative rate",
        os.path.join(args.out_dir, "plot_chainback.png"),
        args.chip_name, args.baseline,
    )


if __name__ == "__main__":
    main()
