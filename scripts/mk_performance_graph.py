#!/usr/bin/env python
"""Elapsed time + TFLOPS vs m, per mode.

≙ scripts/standard_test/mk_performance_graph.py (log-log time panel
1e-4..6.1e1 s, TFLOPS panel 0..peak).  Consumes the speed-harness CSV
(tsqr_tpu/harness/speed.py schema).

Usage: python scripts/mk_performance_graph.py performance.csv [out.pdf]
       [extra.csv ...]

Extra CSVs may use the capacity-row schemas (data/bigm2.csv
``m,n,compute_mode,method,elapsed_time,tflops,...`` or data/bigm3.csv
``m,n,mode_method,elapsed_time,tflops,...``); their rows are scatter-
marked on both panels, extending the m envelope beyond the sweep range
(the reference plot's m reaches 2^26, mk_performance_graph.py:40-49).
"""

import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from plot_common import label, load, style


def load_capacity(path: str):
    df = load(path)
    if "mode_method" in df.columns:
        df["compute_mode"] = df["mode_method"]
    elif "method" in df.columns:
        df["compute_mode"] = df["compute_mode"] + "/" + df["method"]
    return df[["m", "n", "compute_mode", "elapsed_time", "tflops"]]


def main(csv_path: str, out: str = "performance.pdf", *extras: str) -> None:
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
    for path in extras:
        ex = load_capacity(path)
        for cm, g in ex.groupby("compute_mode"):
            g = g.sort_values("m")
            axes[0].plot(g["m"], g["elapsed_time"], "x", ms=7,
                         label=f"{cm} (capacity)")
            axes[1].plot(g["m"], g["tflops"], "x", ms=7,
                         label=f"{cm} (capacity)")
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
