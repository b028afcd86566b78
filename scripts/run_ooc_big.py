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


def regen_main(args):
    """Device-resident matrix-free route to m=2^26: A defined by an
    on-device generator (hardware-rate rbg PRNG), never materialized;
    every pass regenerates chunks; Q folds into streamed metrics.  This
    measures the CHIP's QR rate at the envelope edge, decoupled from the
    test tunnel's 0.04 GB/s host link (the host-streamed row above is
    the host-resident capability; this is the throughput row)."""
    import jax
    import jax.numpy as jnp
    from tsqr_tpu.core import ooc
    from tsqr_tpu.harness import flops as flops_mod

    m, n = 1 << args.m, args.n
    chunk = args.chunk
    impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    key = jax.random.key(7, impl=impl)
    io = jnp.bfloat16 if args.mode == "bf16" else jnp.float32
    gen = ooc.uniform_gen(key, chunk, n, dtype=io)
    method = {"bf16": "cholqr1", "bf16x6_cor": "cholqr2"}.get(
        args.mode, "cholqr2")

    prog = ooc.regen_program(gen, m, n, args.mode, method=method,
                             chunk_rows=chunk)
    r, orth_a, resid_a, _ = prog()  # compile + correctness run
    orth, resid = float(orth_a), float(resid_a)
    # timed runs of the ALREADY-TRACED program (re-calling qr_regen would
    # re-trace per call inside the timed window); dispatch ~30 ms is
    # subtracted, everything else is the fused device program
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = prog()
        float(out[2])
        best = min(best, time.perf_counter() - t0)
    t = best - 0.030
    useful = flops_mod.qr_flops(m, n)
    row = (f"{m},{n},{args.mode},{method}_regen[device_streamed],"
           f"{t:.6e},{useful/t/1e12:.3f},{orth:.3e},{resid:.3e}")
    path = ROOT / "data" / "bigm2.csv"
    with open(path, "a") as f:
        f.write(row + "\n")
    print(f"appended to {path}: {row}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=26)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--probe-only", action="store_true")
    ap.add_argument("--chunk", type=int, default=1 << 21)
    ap.add_argument("--mode", default="bf16")
    ap.add_argument("--regen", action="store_true",
                    help="device-resident matrix-free pipeline (no host "
                         "streaming); appends a *_regen row")
    ap.add_argument("--checkpoint", default=None,
                    help="resumable host route: per-chunk checkpoint at "
                         "this path + separate Q buffer instead of "
                         "in-place (survives tunnel wedges; rerun the "
                         "same command to resume)")
    args = ap.parse_args()

    if args.regen:
        regen_main(args)
        return

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

    print("running OOC cholqr1 (bf16, in-pass metrics)...", flush=True)
    t0 = time.perf_counter()
    # metrics computed DURING the Q pass (chunk resident anyway): the
    # previous design's separate orth + regen-residual passes re-streamed
    # 2 x 17 GB through the tunnel and were OOM-killed at 130 GB RSS by
    # unbounded H2D staging (see qr_out_of_core docstring)
    if args.checkpoint:
        # resumable: checkpointing forbids in-place (redone chunks
        # recompute from intact A), and cross-PROCESS resume skips the
        # already-completed Q chunks — Q must be disk-backed so those
        # rows survive the dead process (qr_out_of_core docstring)
        resumed = pathlib.Path(args.checkpoint).exists()
        q_buf = np.memmap(args.checkpoint + ".q", dtype=a.dtype,
                          mode="r+" if resumed else "w+", shape=a.shape)
        q, r, info = ooc.qr_out_of_core(a, "bf16", method="cholqr1",
                                        chunk_rows=args.chunk, out=q_buf,
                                        metrics=True,
                                        checkpoint=args.checkpoint)
        label = ("ooc_cholqr1[host_ckpt_resumed]" if resumed
                 else "ooc_cholqr1[host_ckpt]")
    else:
        q, r, info = ooc.qr_out_of_core(a, "bf16", method="cholqr1",
                                        chunk_rows=args.chunk, out=a,
                                        metrics=True)  # in place
        label = "ooc_cholqr1[host_streamed]"
    t = time.perf_counter() - t0
    useful = flops_mod.qr_flops(m, n)
    orth, resid = info["orthogonality"], info["residual"]
    print(f"elapsed {t:.1f} s  wall-TFLOP/s {useful/t/1e12:.3f}  "
          f"orth {orth:.3e}  resid {resid:.3e}", flush=True)

    # match the bigm2.csv schema:
    # m,n,compute_mode,method,elapsed_time,tflops,orthogonality,residual
    # (a *_resumed row's elapsed spans only the post-resume segment —
    # its metrics, not its time, are the rehearsal evidence)
    row = (f"{m},{n},bf16,{label},{t:.6e},"
           f"{useful/t/1e12:.3f},{orth:.3e},{resid:.3e}")
    path = ROOT / "data" / "bigm2.csv"
    with open(path, "a") as f:
        f.write(row + "\n")
    print(f"appended to {path}: {row}", flush=True)


if __name__ == "__main__":
    main()
