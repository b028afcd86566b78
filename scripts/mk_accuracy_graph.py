#!/usr/bin/env python
"""Residual + orthogonality vs m, per mode.

≙ scripts/standard_test/mk_accuracy_graph.py (ylim 1e-6 .. 6.1e-2; two
stacked panels: relative residual and orthogonality).  Consumes the
accuracy-harness CSV (tsqr_tpu/harness/accuracy.py schema).

Usage: python scripts/mk_accuracy_graph.py accuracy.csv [out.pdf]
"""

import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from plot_common import label, load, style


def main(csv_path: str, out: str = "accuracy.pdf") -> None:
    df = load(csv_path)
    fig, axes = plt.subplots(2, 1, figsize=(7, 8), sharex=True)
    # one line per n when the CSV covers the wide grid (multiple n per m)
    multi_n = df["n"].nunique() > 1
    for (mode, reorth, n), g in df.groupby(["compute_mode",
                                            "reorthogonalization", "n"]):
        g = g.sort_values("m")
        lbl = label(mode, reorth) + (f" n={n}" if multi_n else "")
        axes[0].plot(g["m"], g["residual"], label=lbl, **style(mode))
        axes[1].plot(g["m"], g["orthogonality"], label=lbl, **style(mode))
    for ax, name in zip(axes, ["relative residual ||A-QR||_F/||A||_F",
                               "orthogonality ||QtQ-I||_F/sqrt(n)"]):
        ax.set_xscale("log", base=2)
        ax.set_yscale("log")
        ax.set_ylim(1e-8, 6.1e-2)
        ax.set_ylabel(name)
        ax.grid(True, alpha=0.3)
    axes[1].set_xlabel("m")
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
