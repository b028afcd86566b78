"""Q-quality harness: diagonal vs off-diagonal orthogonality error.

≙ the reference's eval_q study (scripts/eval_q/mk_graph.py consuming
check_orthogonality16_each, validation.cu:86-127): split ||Q^TQ - I||_F
into the diagonal part (column normalization error) and the off-diagonal
part (loss of mutual orthogonality) — correction modes mainly fix the
latter.  CSV: m,n,compute_mode,reorthogonalization,diag,offdiag.
"""

from __future__ import annotations

import sys
from typing import IO, Sequence

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr
from tsqr_tpu.utils import validation

CSV_HEADER = "m,n,compute_mode,reorthogonalization,diag,offdiag"


def eval_q_row(m: int, n: int, mode: str, reorth: bool = False,
               seed: int = 0, **qr_kw) -> dict:
    policy = modes.resolve(mode)
    a = jax.random.uniform(jax.random.PRNGKey(seed), (m, n), jnp.float32,
                           -1, 1)
    q, _ = blockqr.qr(a, policy, reorth=reorth, **qr_kw)
    d, off = validation.orthogonality_each(q)
    return {"m": m, "n": n, "compute_mode": policy.name,
            "reorthogonalization": int(reorth), "diag": d, "offdiag": off}


def format_row(row: dict) -> str:
    return (f"{row['m']},{row['n']},{row['compute_mode']},"
            f"{row['reorthogonalization']},{row['diag']:.6e},"
            f"{row['offdiag']:.6e}")


def sweep(ms: Sequence[int], n: int, mode_names: Sequence[str],
          reorths: Sequence[bool] = (False, True), out: IO = sys.stdout,
          **kw) -> list[dict]:
    print(CSV_HEADER, file=out, flush=True)
    rows = []
    for mode in mode_names:
        for reorth in reorths:
            for m in ms:
                row = eval_q_row(m, n, mode, reorth, **kw)
                rows.append(row)
                print(format_row(row), file=out, flush=True)
    return rows
