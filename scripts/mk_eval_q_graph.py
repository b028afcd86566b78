#!/usr/bin/env python
"""Diagonal vs off-diagonal orthogonality error of Q.

≙ scripts/eval_q/mk_graph.py: split ||QtQ-I|| into its diagonal and
off-diagonal parts per mode to show where correction helps.  Consumes a
CSV with columns m,n,compute_mode,reorthogonalization,diag,offdiag
(produced by harness users via validation.orthogonality_each).

Usage: python scripts/mk_eval_q_graph.py eval_q.csv [out.pdf]
"""

import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from plot_common import label, load, style


def main(csv_path: str, out: str = "eval_q.pdf") -> None:
    df = load(csv_path)
    fig, axes = plt.subplots(2, 1, figsize=(7, 8), sharex=True)
    for (mode, reorth), g in df.groupby(["compute_mode",
                                         "reorthogonalization"]):
        g = g.sort_values("m")
        axes[0].plot(g["m"], g["diag"], label=label(mode, reorth),
                     **style(mode))
        axes[1].plot(g["m"], g["offdiag"], label=label(mode, reorth),
                     **style(mode))
    for ax, name in zip(axes, ["diagonal part", "off-diagonal part"]):
        ax.set_xscale("log", base=2)
        ax.set_yscale("log")
        ax.set_ylabel(name)
        ax.grid(True, alpha=0.3)
    axes[1].set_xlabel("m")
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
