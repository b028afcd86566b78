"""Run-provenance banner ≙ the vendored runtime_status submodule
(.gitmodules:1-12; printed at main.cu:90-93: git branch/commit, build date,
device info)."""

from __future__ import annotations

import datetime
import subprocess
import sys


def _git(*args: str) -> str:
    try:
        return subprocess.run(["git", *args], capture_output=True,
                              text=True, timeout=5).stdout.strip()
    except Exception:
        return "unknown"


def print_matrix(a, name: str = "", file=sys.stdout,
                 max_rows: int = 32, max_cols: int = 16) -> None:
    """Labeled matrix dump for ad-hoc debugging (≙ mtk::utils::print_matrix,
    utils.hpp:11-107: host/device matrix printers used by the reference's
    DEBUG* flags and visual unit tests)."""
    import numpy as np

    a = np.asarray(a)
    if name:
        print(f"# {name} {a.shape} {a.dtype}", file=file)
    if a.ndim == 0:
        a = a.reshape(1, 1)
    elif a.ndim == 1:
        a = a.reshape(-1, 1)
    elif a.ndim > 2:  # batched tiles: flatten trailing dims per row
        a = a.reshape(a.shape[0], -1)
    r, c = a.shape
    view = a[:max_rows, :max_cols]
    for row in view:
        print(" ".join(f"{v:+.4e}" for v in row), file=file)
    if r > max_rows or c > max_cols:
        print(f"# ... truncated to {max_rows}x{max_cols}", file=file)


def exc_note(e: BaseException, limit: int = 200) -> str:
    """One-line '# error ...' payload for CSV sweeps: harness error rows
    must stay single lines (multi-line compiler backtraces previously
    leaked into data/mfu.csv and broke the CSV parse)."""
    return f"{type(e).__name__}: " + " ".join(str(e).split())[:limit]


def print_banner(file=sys.stderr) -> None:
    import jax
    print(f"# tsqr-tpu  branch={_git('rev-parse', '--abbrev-ref', 'HEAD')} "
          f"commit={_git('rev-parse', '--short', 'HEAD')}", file=file)
    print(f"# date={datetime.datetime.now().isoformat(timespec='seconds')} "
          f"jax={jax.__version__} devices={[str(d) for d in jax.devices()]}",
          file=file)
