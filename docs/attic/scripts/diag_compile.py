#!/usr/bin/env python
"""Compile-only bisect of the 2^22 ladder failure (one case per process).

Usage: python scripts/diag_compile.py <case> [log2_m] [leaf_rows]
Cases: tier3 (blockqr jnp tree), ladder2 (fast+gate+hh), ladder3 (bench
config), mid (cholqr3_fused compact), tsqr1 (bare tsqr tree).
"""

import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tsqr_tpu.core import auto, blockqr, cholqr, tsqr

case = sys.argv[1]
log2m = int(sys.argv[2]) if len(sys.argv) > 2 else 22
leaf_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
m, n = 1 << log2m, 128
spec = jax.ShapeDtypeStruct((m, n), jnp.float32)

FNS = {
    "tier3": lambda x: blockqr.qr(x, "bf16x6_cor", reorth=True, impl="jnp",
                                  leaf_rows=leaf_rows, fanin=8),
    "tier3_noreorth": lambda x: blockqr.qr(x, "bf16x6_cor", reorth=False,
                                           impl="jnp", leaf_rows=leaf_rows,
                                           fanin=8),
    "ladder2": lambda x: auto.qr_auto_fused(x, "bf16x6_cor",
                                            fast_method="cholqr1_fused",
                                            leaf_rows=leaf_rows),
    "ladder3": lambda x: auto.qr_auto_fused(x, "bf16x6_cor",
                                            fast_method="cholqr1_fused",
                                            mid_method="cholqr3_fused",
                                            mid_variant="compact",
                                            leaf_rows=leaf_rows),
    "mid": lambda x: cholqr.fastqr(x, "bf16x6_cor", method="cholqr3_fused",
                                   variant="compact"),
    "tsqr1": lambda x: tsqr.tsqr(x, "bf16x6_cor", impl="jnp",
                                 leaf_rows=leaf_rows, fanin=8),
}

fn = FNS[case]
t0 = time.perf_counter()
lowered = jax.jit(fn).lower(spec)
t1 = time.perf_counter()
print(f"{case} m=2^{log2m} leaf={leaf_rows}: lowered in {t1-t0:.1f}s; "
      f"HLO chars={len(lowered.as_text())}", flush=True)
compiled = lowered.compile()
t2 = time.perf_counter()
mem = compiled.memory_analysis()
print(f"{case}: COMPILED in {t2-t1:.1f}s  "
      f"temp={getattr(mem, 'temp_size_in_bytes', '?')}", flush=True)
