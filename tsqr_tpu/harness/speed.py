"""Speed harness: elapsed time + model TFLOPS + working-memory CSV.

≙ mtk::test_qr::speed (test.cu:236-336): 1 warm-up + C timed runs
(test.cu:290-309), TFLOPS via the explicit complexity model
(test.cu:311-326), CSV schema ``m,n,type,compute_mode,reorthogonalization,
elapsed_time,tflops,working_memory_size`` (test.cu:60-63).
"""

from __future__ import annotations

import sys
from typing import IO, Sequence

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr, tsqr as tsqr_mod
from tsqr_tpu.harness import flops as flops_mod

CSV_HEADER = ("m,n,type,compute_mode,reorthogonalization,elapsed_time,"
              "tflops,working_memory_size")


def speed_row(m: int, n: int, mode: str, reorth: bool = False,
              trials: int = 8, seed: int = 0, panel_width: int = 128,
              leaf_rows: int = tsqr_mod.DEFAULT_LEAF_ROWS,
              fanin: int = tsqr_mod.DEFAULT_FANIN, impl: str = "jnp",
              panel_method: str = "tsqr") -> dict:
    policy = modes.resolve(mode)
    a = jax.random.uniform(jax.random.PRNGKey(seed), (m, n), jnp.float32,
                           -1, 1)
    # 1 warm-up + timed runs (≙ test.cu:290-309); amortized in-jit chaining
    # because block_until_ready is unreliable on tunneled backends, with
    # loops auto-scaled so fast configs are not measured within dispatch
    # jitter (timing.time_fn_amortized_auto)
    from tsqr_tpu.utils import timing
    elapsed, _ = timing.time_fn_amortized_auto(
        lambda x: blockqr.qr(x, policy, reorth=reorth,
                             panel_width=panel_width, leaf_rows=leaf_rows,
                             fanin=fanin, impl=impl,
                             panel_method=panel_method),
        a, reps=2, max_loops=max(8, trials))
    fl = flops_mod.blockqr_flops(m, n, panel_width, leaf_rows, fanin, reorth)
    wmem = tsqr_mod.working_memory_elems(m, min(n, panel_width), leaf_rows,
                                         fanin) * 4
    return {"m": m, "n": n, "type": "float32", "compute_mode": policy.name,
            "reorthogonalization": int(reorth), "elapsed_time": elapsed,
            "tflops": fl / elapsed / 1e12, "working_memory_size": wmem}


def format_row(row: dict) -> str:
    return (f"{row['m']},{row['n']},{row['type']},{row['compute_mode']},"
            f"{row['reorthogonalization']},{row['elapsed_time']:.6e},"
            f"{row['tflops']:.4f},{row['working_memory_size']}")


def sweep(ms: Sequence[int], ns: Sequence[int], mode_names: Sequence[str],
          reorths: Sequence[bool] = (False,), out: IO = sys.stdout,
          **kw) -> list[dict]:
    print(CSV_HEADER, file=out, flush=True)
    rows = []
    for mode in mode_names:
        for reorth in reorths:
            for m in ms:
                for n in ns:
                    if n > m:
                        continue
                    try:
                        row = speed_row(m, n, mode, reorth, **kw)
                    except Exception as e:
                        from tsqr_tpu.utils.status import exc_note
                        print(f"# error m={m} n={n} mode={mode}: "
                              f"{exc_note(e)}", file=out, flush=True)
                        continue
                    rows.append(row)
                    print(format_row(row), file=out, flush=True)
    return rows
