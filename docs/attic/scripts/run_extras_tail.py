#!/usr/bin/env python
"""The extras items the fused-sb-tree compile crash kept eating:

* sb-kernel leaf-workload timing (the 2^20 x 128 leaf batch, kernel
  called directly — the whole-tree-with-sb-leaves program crashes the
  remote compile helper, so the leaf measurement is the honest unit)
* fused-tree phase split (impl=jnp)
* qr_auto fallback cost on a matrix that actually triggers it

Appends to data/extras.csv.
"""

import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from tsqr_tpu.core import auto
from tsqr_tpu.harness import flops as flops_mod, profile
from tsqr_tpu.utils import latms, timing, validation
from tsqr_tpu.utils.status import exc_note

DATA = ROOT / "data"
mt, nt = 1 << 20, 128

with open(DATA / "extras.csv", "a") as f:
    # leaf-workload sb-kernel timing: SKIPPED this run — the remote
    # compile helper crashes/hangs on the sb program today (3 attempts);
    # the 23.5 ms leaf measurement stands from the earlier session
    # (docs/ROUND2.md) and the kernel is covered by the TPU-gated lane.
    # phase split of the real fused tree (impl=jnp)
    try:
        res = profile.tsqr_phase_split(mt, nt, "fp32", out=sys.stderr,
                                       impl="jnp")
        print(f"tree_phase_split_r_pct,{mt},{nt},"
              f"{res['compute_r_s']:.6e},,,q_pct={res['q_pct']:.1f}",
              file=f, flush=True)
    except Exception as e:
        print("# error phase split: " + exc_note(e), file=f, flush=True)
    # qr_auto fallback cost (kappa ~ 3e7 defeats shifted CholeskyQR3)
    try:
        a_bad, kappa = latms.rand_matrix_with_cond(
            jax.random.PRNGKey(7), mt, nt, 3.0e7)
        t0 = time.perf_counter()
        q, r, used = auto.qr_auto(a_bad, "fp32", leaf_rows=2048)
        orth = float(validation.orthogonality_accurate(q))
        t_wall = time.perf_counter() - t0
        fl = flops_mod.qr_flops(mt, nt)
        print(f"auto_fallback[{used}],{mt},{nt},{t_wall:.6e},"
              f"{fl/t_wall/1e12:.3f},{orth:.3e},kappa={kappa:.2e}",
              file=f, flush=True)
        print(f"extras auto fallback: used={used} wall={t_wall:.2f} s "
              f"orth={orth:.2e} kappa={kappa:.2e}", file=sys.stderr,
              flush=True)
    except Exception as e:
        print("# error auto_fallback: " + exc_note(e), file=f, flush=True)
print("extras_tail done", file=sys.stderr, flush=True)
