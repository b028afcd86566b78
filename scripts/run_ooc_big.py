#!/usr/bin/env python
"""The m=2^26 envelope edge: out-of-core QR through the single chip.

Reference envelope: m up to 2^26 (mk_performance_graph.py:40-49 /
BASELINE.md).  At 2^26 x 128 even bf16 A alone (17 GB) exceeds the
chip's 15.75 GB HBM, so this streams host-resident chunks (core/ooc.py):
cholqr1 in bf16 = 2 H2D reads + 1 D2H write of A-sized traffic.

Appends a row to data/bigm2.csv and prints metrics.  Usage:
  python scripts/run_ooc_big.py [--m LOG2M] [--probe-only]
"""

import argparse
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np
import jax
import jax.numpy as jnp


def h2d_probe(chunk_rows=1 << 20, n=128):
    x = np.random.default_rng(0).uniform(-1, 1, (chunk_rows, n))
    x = x.astype(jnp.bfloat16)
    # warm the path first (backend init, allocator)
    d = jnp.asarray(x[: 1 << 16])
    float(jnp.sum(d.astype(jnp.float32)[..., :1]))
    t0 = time.perf_counter()
    d = jnp.asarray(x)
    float(jnp.sum(d.astype(jnp.float32)[..., :1]))
    t = time.perf_counter() - t0
    bw = x.nbytes / t / 1e9
    print(f"H2D probe: {x.nbytes/1e6:.0f} MB in {t:.2f} s = {bw:.3f} GB/s",
          flush=True)
    t0 = time.perf_counter()
    h = np.asarray(d)
    t = time.perf_counter() - t0
    print(f"D2H probe: {h.nbytes/1e6:.0f} MB in {t:.2f} s = "
          f"{h.nbytes/t/1e9:.3f} GB/s", flush=True)
    del d, h
    return bw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=26)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--probe-only", action="store_true")
    ap.add_argument("--chunk", type=int, default=1 << 21)
    args = ap.parse_args()

    bw = h2d_probe()
    if args.probe_only:
        return
    m, n = 1 << args.m, args.n
    est = 3 * m * n * 2 / bw / 1e9
    print(f"m=2^{args.m} n={n} bf16: ~{m*n*2/1e9:.1f} GB/pass, "
          f"est transfer time ~{est:.0f} s", flush=True)

    from tsqr_tpu.core import ooc
    from tsqr_tpu.harness import flops as flops_mod

    print("generating host A (chunked bf16)...", flush=True)
    a = np.empty((m, n), jnp.dtype(jnp.bfloat16))
    rng = np.random.default_rng(7)
    gchunk = 1 << 22
    for lo in range(0, m, gchunk):
        hi = min(lo + gchunk, m)
        a[lo:hi] = rng.uniform(-1, 1, (hi - lo, n)).astype(jnp.bfloat16)

    print("running OOC cholqr1 (bf16)...", flush=True)
    t0 = time.perf_counter()
    q, r = ooc.qr_out_of_core(a, "bf16", method="cholqr1",
                              chunk_rows=args.chunk, out=a)  # in place
    t = time.perf_counter() - t0
    useful = flops_mod.qr_flops(m, n)
    print(f"elapsed {t:.1f} s  wall-TFLOP/s {useful/t/1e12:.3f}", flush=True)

    orth = ooc.ooc_orthogonality(q, chunk_rows=args.chunk)
    print(f"orthogonality (streamed, Kahan): {orth:.3e}", flush=True)
    # residual would need a second A copy (Q aliased A) — regenerate
    # chunks instead, bitwise-identically to the fill above
    d2 = jnp.zeros((), jnp.float32)
    a2 = jnp.zeros((), jnp.float32)
    rng = np.random.default_rng(7)
    r_dev = jnp.asarray(np.asarray(r, np.float32))

    @jax.jit
    def step(ac, qc, rr, d2, a2):
        ac = ac.astype(jnp.float32)
        d = ac - jnp.matmul(qc.astype(jnp.float32), rr,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        return d2 + jnp.sum(d * d), a2 + jnp.sum(ac * ac)

    for lo in range(0, m, gchunk):
        hi = min(lo + gchunk, m)
        ac = rng.uniform(-1, 1, (hi - lo, n)).astype(jnp.bfloat16)
        d2, a2 = step(jnp.asarray(ac), jnp.asarray(q[lo:hi]), r_dev, d2, a2)
    resid = float(jnp.sqrt(d2) / jnp.sqrt(a2))
    print(f"residual (regen, streamed): {resid:.3e}", flush=True)

    # match the bigm2.csv schema:
    # m,n,compute_mode,method,elapsed_time,tflops,orthogonality,residual
    row = (f"{m},{n},bf16,ooc_cholqr1[host_streamed],{t:.6e},"
           f"{useful/t/1e12:.3f},{orth:.3e},{resid:.3e}")
    path = ROOT / "data" / "bigm2.csv"
    with open(path, "a") as f:
        f.write(row + "\n")
    print(f"appended to {path}: {row}", flush=True)


if __name__ == "__main__":
    main()
