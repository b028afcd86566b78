#!/usr/bin/env python
"""Residual + orthogonality vs condition number.

≙ scripts/cond_test/mk_accuracy_graph.py (xlim 2..2^17; *_cor + reorth
expected flat vs kappa).  Consumes the cond-harness CSV
(tsqr_tpu/harness/cond.py schema).

Usage: python scripts/mk_cond_graph.py cond.csv [out.pdf]
"""

import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from plot_common import label, load, style


def main(csv_path: str, out: str = "cond.pdf") -> None:
    df = load(csv_path)
    fig, axes = plt.subplots(2, 1, figsize=(7, 8), sharex=True)
    for (mode, reorth), g in df.groupby(["compute_mode",
                                         "reorthogonalization"]):
        g = g.sort_values("condition")
        axes[0].plot(g["condition"], g["residual"],
                     label=label(mode, reorth), **style(mode))
        axes[1].plot(g["condition"], g["orthogonality"],
                     label=label(mode, reorth), **style(mode))
    for ax, name in zip(axes, ["relative residual", "orthogonality"]):
        ax.set_xscale("log", base=2)
        ax.set_yscale("log")
        ax.set_xlim(2, 2 ** 17)
        ax.set_ylabel(name)
        ax.grid(True, alpha=0.3)
    axes[1].set_xlabel("condition number")
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
