#!/usr/bin/env python
"""Ladder decision-boundary graph from data/ladder.csv.

Two panels vs measured kappa: (top) end-to-end orthogonality/residual of
the predictive ladder with the tier regions shaded, (bottom) elapsed
time per tier.  ≙ the reference's cond-sweep accuracy graph
(scripts/cond_test/mk_accuracy_graph.py) extended with the tier axis the
static-mode reference cannot have.

Usage: python scripts/mk_ladder_graph.py data/ladder.csv data/ladder.pdf
"""

import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

import plot_common

TIER_COLORS = {"fast": "#2ca02c", "robust": "#1f77b4",
               "iter": "#9467bd", "householder": "#d62728"}


def main():
    csv, out = sys.argv[1], sys.argv[2]
    df = plot_common.load(csv)

    fig, (ax0, ax1) = plt.subplots(
        2, 1, figsize=(7, 7), sharex=True,
        gridspec_kw={"height_ratios": [3, 2]})

    for tier, sub in df.groupby("tier"):
        c = TIER_COLORS.get(tier, "#7f7f7f")
        ax0.plot(sub.kappa_measured, sub.orthogonality, "o",
                 color=c, label=f"orthogonality [{tier}]")
        ax0.plot(sub.kappa_measured, sub.residual, "s", mfc="none",
                 color=c, label=f"residual [{tier}]")
        ax1.plot(sub.kappa_measured, sub.elapsed_time * 1e3, "o-",
                 color=c, label=tier)

    ax0.set_xscale("log")
    ax0.set_yscale("log")
    ax0.set_ylim(1e-8, 1e-5)
    ax0.set_ylabel("error (fp64-evaluated)")
    ax0.axhline(1e-5, color="k", lw=0.5, ls="--")
    ax0.set_title("predictive ladder: accuracy and cost vs conditioning\n"
                  f"(m={int(df.m.iloc[0])}, n={int(df.n.iloc[0])}, "
                  "bf16x6_cor)")
    ax0.grid(alpha=0.3)
    ax0.legend(fontsize=7, ncol=2)

    ax1.set_xscale("log")
    ax1.set_yscale("log")
    ax1.set_xlabel("measured condition number")
    ax1.set_ylabel("elapsed time [ms]")
    ax1.grid(alpha=0.3)
    ax1.legend(fontsize=8)

    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
