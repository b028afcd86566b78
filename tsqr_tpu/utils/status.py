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
