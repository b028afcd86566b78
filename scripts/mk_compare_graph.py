#!/usr/bin/env python
"""Per-mode accuracy vs the fp64 golden.

≙ scripts/compare_to_cusolver/mk_graph.py (golden here: LAPACK fp64 via
numpy instead of cuSOLVER).  Consumes a CSV with columns
m,n,compute_mode,q_max_rel_diff,r_max_rel_diff (from harness/compare.py).

Usage: python scripts/mk_compare_graph.py compare.csv [out.pdf]
"""

import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from plot_common import load, style


def main(csv_path: str, out: str = "compare.pdf") -> None:
    df = load(csv_path)
    fig, ax = plt.subplots(figsize=(7, 5))
    for mode, g in df.groupby("compute_mode"):
        g = g.sort_values("m")
        ax.plot(g["m"], g["r_max_rel_diff"], label=f"{mode} (R)",
                **style(mode))
        ax.plot(g["m"], g["q_max_rel_diff"], ls="--", alpha=0.6,
                label=f"{mode} (Q)", **style(mode))
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xlabel("m")
    ax.set_ylabel("max relative diff vs fp64 golden")
    ax.legend(fontsize=7)
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
