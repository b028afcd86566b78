#!/usr/bin/env python
"""Elapsed time + TFLOPS vs m, per mode.

≙ scripts/standard_test/mk_performance_graph.py (log-log time panel
1e-4..6.1e1 s, TFLOPS panel 0..peak).  Consumes the speed-harness CSV
(tsqr_tpu/harness/speed.py schema).

Usage: python scripts/mk_performance_graph.py performance.csv [out.pdf]
"""

import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from plot_common import label, load, style


def main(csv_path: str, out: str = "performance.pdf") -> None:
    df = load(csv_path)
    fig, axes = plt.subplots(2, 1, figsize=(7, 8), sharex=True)
    # one line per n when the CSV covers the wide grid (multiple n per m)
    multi_n = df["n"].nunique() > 1
    for (mode, reorth, n), g in df.groupby(["compute_mode",
                                            "reorthogonalization", "n"]):
        g = g.sort_values("m")
        lbl = label(mode, reorth) + (f" n={n}" if multi_n else "")
        axes[0].plot(g["m"], g["elapsed_time"], label=lbl, **style(mode))
        axes[1].plot(g["m"], g["tflops"], label=lbl, **style(mode))
    axes[0].set_yscale("log")
    axes[0].set_ylim(1e-5, 6.1e1)
    axes[0].set_ylabel("elapsed time [s]")
    axes[1].set_ylabel("TFLOP/s")
    for ax in axes:
        ax.set_xscale("log", base=2)
        ax.grid(True, alpha=0.3)
    axes[1].set_xlabel("m")
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
