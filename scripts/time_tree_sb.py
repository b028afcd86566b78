#!/usr/bin/env python
"""On-chip timing of the fused TSQR tree with sublane-batched Pallas
leaves at 2^20 x 128 — the round-2 verdict's item-2 evidence row
(reference artifact: the whole tree on-device, tsqr.cu:1064-1279).

Rounds 2-4 history: the L=2048-leaf sb program (T=16, 32 vregs per
unrolled value) SIGKILLs the tunnel's remote-compile helper, while the
m=2^18 test config (L=512, 8 vregs) compiles green.  Round 5 therefore
probes tree CONFIGS WITHIN the proven T*L compile budget
(core/tsqr.SB_TL_BUDGET), each in a FRESH subprocess with a timeout so
one helper SIGKILL (which poisons/hangs the parent's dispatch) cannot
eat the section:

  tree_sb[l1024f4]  leaf 1024 / fanin 4 -> auto T=8  (T*L = 8192)
  tree_sb[l512f8]   leaf  512 / fanin 8 -> auto T=16 (T*L = 8192)
  tree_sb[l2048f8t8] leaf 2048 / fanin 8 / T=8 FORCED (T*L = 16384 —
                    the budget-boundary probe; expected to fail compile)
  tree_jnp_r5       leaf 2048 XLA baseline under identical conditions

Rows append to data/extras.csv.  Plain (cond-free) programs ->
time_fn_amortized_auto is the valid harness (docs/ROUND3.md section 2).
"""

import os
import pathlib
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

M, N = 1 << 20, 128
OUT = ROOT / "data" / "extras.csv"

CHILD = """
import sys
sys.path.insert(0, {root!r})
import jax, jax.numpy as jnp
from tsqr_tpu.core import tsqr as tsqr_mod
from tsqr_tpu.harness import flops as flops_mod
from tsqr_tpu.utils import timing, validation
M, N = {m}, {n}
a = jax.random.uniform(jax.random.PRNGKey(3), (M, N), jnp.float32, -1, 1)
fn = lambda x: tsqr_mod.tsqr(x, "fp32", impl={impl!r},
                             leaf_rows={leaf}, fanin={fanin}, block=32,
                             sb_tiles={tiles})
q, r = fn(a)
orth = validation.orthogonality_accurate(q)
del q, r
t, loops = timing.time_fn_amortized_auto(fn, a, reps=3, max_loops=8)
useful = flops_mod.qr_flops(M, N)
print(f"ROW {name},{{M}},{{N}},{{t:.6e}},{{useful/t/1e12:.3f}},"
      f"{{orth:.3e}},loops={{loops}}", flush=True)
"""


def _done() -> set:
    if not OUT.exists():
        return set()
    return {ln.split(",")[0] for ln in OUT.read_text().splitlines()[1:]
            if ln.strip() and not ln.startswith("#")}


def main() -> None:
    from tsqr_tpu.utils.status import exc_note

    configs = [
        # (row name, impl, leaf_rows, fanin, sb_tiles, timeout_s)
        ("tree_sb[l1024f4]", "pallas_sb", 1024, 4, None, 1200),
        ("tree_sb[l512f8]", "pallas_sb", 512, 8, None, 1200),
        ("tree_jnp_r5", "jnp", 2048, 8, None, 1200),
        ("tree_sb[l2048f8t8]", "pallas_sb", 2048, 8, 8, 900),
    ]
    done = _done()
    with open(OUT, "a") as f:
        for name, impl, leaf, fanin, tiles, tmo in configs:
            if name in done:
                print(f"{name}: already measured — skip", flush=True)
                continue
            code = CHILD.replace("{name}", name).format(
                root=str(ROOT), m=M, n=N, impl=impl, leaf=leaf,
                fanin=fanin, tiles=tiles)
            try:
                res = subprocess.run([sys.executable, "-u", "-c", code],
                                     capture_output=True, text=True,
                                     timeout=tmo, env=dict(os.environ))
                rows = [ln[4:] for ln in res.stdout.splitlines()
                        if ln.startswith("ROW ")]
                if not rows:
                    raise RuntimeError(f"exit={res.returncode} "
                                       f"stderr={res.stderr.strip()[-300:]}")
                f.write(rows[-1] + "\n")
                f.flush()
                print(f"{name}: {rows[-1]}", flush=True)
            except Exception as e:
                f.write(f"# error {name}: {exc_note(e)}\n")
                f.flush()
                print(f"{name} FAILED: {exc_note(e)}", flush=True)


if __name__ == "__main__":
    main()
