#!/usr/bin/env python
"""Bisect which ladder configuration crashes the remote-compile helper.

Each config runs in a FRESH subprocess (a compile-helper 500 or device
OOM poisons the whole process, CLAUDE.md)."""

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

CHILD = r"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, sys.argv[1])
logm = int(sys.argv[2]); tiers = sys.argv[3]
import jax, jax.numpy as jnp
from tsqr_tpu.core import auto
from tsqr_tpu.utils import timing, validation

m, n = 1 << logm, 128
a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32, -1, 1)

kw = dict(mode="bf16x6_cor")
if tiers == "fast_hh":
    kw.update(fast_method="cholqr1_fused")
elif tiers == "fast_mid_hh":
    kw.update(fast_method="cholqr1_fused", mid_method="cholqr3_fused",
              mid_variant="compact")
elif tiers == "fast_mid_hh8192":
    kw.update(fast_method="cholqr1_fused", mid_method="cholqr3_fused",
              mid_variant="compact", leaf_rows=8192)

t0 = time.perf_counter()
q, r = auto.qr_auto_fused(a, **kw)
orth = validation.orthogonality_accurate(q)
print(f"compile+run {time.perf_counter()-t0:.1f}s orth={orth:.2e}",
      flush=True)
del q, r
t, loops = timing.time_fn_amortized_auto(
    lambda x: auto.qr_auto_fused(x, **kw), a, reps=3)
print(f"t={t*1e3:.3f} ms loops={loops}", flush=True)
"""


def main():
    for logm, tiers in (
            (21, "fast_hh"),
            (21, "fast_mid_hh"),
            (22, "fast_hh"),
            (22, "fast_mid_hh"),
            (22, "fast_mid_hh8192"),
    ):
        print(f"== 2^{logm} {tiers} ==", flush=True)
        r = subprocess.run(
            [sys.executable, "-c", CHILD, str(ROOT), str(logm), tiers],
            capture_output=True, text=True, timeout=2400)
        out = (r.stdout or "") + ("" if r.returncode == 0 else
                                  "\nSTDERR: " + (r.stderr or "")[-800:])
        for line in out.splitlines():
            if line and "WARNING" not in line:
                print("  " + line, flush=True)


if __name__ == "__main__":
    main()
