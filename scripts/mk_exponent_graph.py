#!/usr/bin/env python
"""Floating-point exponent histograms.

≙ scripts/exponent_distribution/mk_graph.py: bar chart of binary-exponent
counts (underflow studies).  Consumes a CSV with columns
name,exponent,count (produced via validation.exponent_distribution).

Usage: python scripts/mk_exponent_graph.py exponents.csv [out.pdf]
"""

import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from plot_common import load


def main(csv_path: str, out: str = "exponents.pdf") -> None:
    df = load(csv_path)
    if "name" not in df.columns:
        # per-tree-level schema (variant,level,exponent,count) from the
        # EVALUATE_EXPONENT_DISTRIBUTION-analogue study (tsqr.cu:26)
        df["name"] = df["variant"] + " L" + df["level"].astype(str)
    fig, ax = plt.subplots(figsize=(8, 5))
    for name, g in df.groupby("name"):
        g = g.sort_values("exponent")
        ax.step(g["exponent"], g["count"], where="mid", label=name)
    ax.axvline(-14, color="red", ls="--", lw=1, label="fp16 min exponent")
    ax.set_yscale("log")
    ax.set_xlabel("binary exponent")
    ax.set_ylabel("count")
    ax.legend(fontsize=7)
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
