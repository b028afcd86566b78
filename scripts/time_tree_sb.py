#!/usr/bin/env python
"""On-chip timing of the fused TSQR tree with sublane-batched Pallas
leaves at 2^20 x 128 — the round-2 verdict's item-2 evidence row
(reference artifact: the whole tree on-device, tsqr.cu:1064-1279).

The round-2 program (an sb kernel instantiated per tree level) killed
the remote-compile helper; round 3 routes inner levels through the XLA
path (tsqr.tree_impl="jnp") and keeps the Pallas kernel for the leaves,
where all the work is.  This script times BOTH leaf impls in one
process so the pair is measured under identical conditions, and appends
`tree_jnp_r3` / `tree_sb` rows to data/extras.csv.

Plain (cond-free) programs -> time_fn_amortized_auto is the valid
harness (docs/ROUND3.md section 2).
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tsqr_tpu.core import tsqr as tsqr_mod  # noqa: E402
from tsqr_tpu.harness import flops as flops_mod  # noqa: E402
from tsqr_tpu.utils import timing, validation  # noqa: E402
from tsqr_tpu.utils.status import exc_note  # noqa: E402

M, N = 1 << 20, 128
OUT = ROOT / "data" / "extras.csv"


def main() -> None:
    a = jax.random.uniform(jax.random.PRNGKey(3), (M, N), jnp.float32,
                           -1, 1)
    useful = flops_mod.qr_flops(M, N)
    with open(OUT, "a") as f:
        for name, impl in (("tree_jnp_r3", "jnp"), ("tree_sb", "pallas_sb")):
            try:
                fn = lambda x: tsqr_mod.tsqr(x, "fp32", impl=impl,
                                             leaf_rows=2048, block=32)
                q, r = fn(a)
                orth = validation.orthogonality_accurate(q)
                del q, r
                t, loops = timing.time_fn_amortized_auto(fn, a, reps=3,
                                                         max_loops=8)
                f.write(f"{name},{M},{N},{t:.6e},{useful/t/1e12:.3f},"
                        f"{orth:.3e},loops={loops}\n")
                f.flush()
                print(f"{name}: {t*1e3:.2f} ms  "
                      f"{useful/t/1e12:.2f} TFLOP/s  orth={orth:.3e}",
                      flush=True)
            except Exception as e:
                f.write(f"# error {name}: {exc_note(e)}\n")
                f.flush()
                print(f"{name} FAILED: {exc_note(e)}", flush=True)


if __name__ == "__main__":
    main()
