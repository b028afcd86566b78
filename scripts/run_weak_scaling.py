#!/usr/bin/env python
"""CPU-mesh wall-clock for the distributed drivers (CORRECTNESS ONLY).

Fixed per-device shard (m/D rows); D = 1, 2, 4, 8 virtual host devices.
Writes data/dweak.csv.  NOT scaling evidence: the virtual devices
time-share one host core, so elapsed time GROWS with D from simulation
overhead — it says nothing about communication behavior on a real mesh.
The communication claim (cross-chip traffic ~D*n^2 allgather /
~log2(D)*n^2 butterfly / 2-3 n^2 psums dcholqr, independent of m) is
proven hardware-independently by scripts/run_wire_bytes.py →
data/dwire.csv, which counts collective bytes in the compiled HLO.

Each D runs in a subprocess (the host-device-count XLA flag is parsed
exactly once per process).
"""

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

CHILD = r"""
import os, sys, time
root = sys.argv[1]
D = int(sys.argv[2]); m_per = int(sys.argv[3]); n = int(sys.argv[4])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={D}")
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
sys.path.insert(0, root)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from tsqr_tpu.parallel import dtsqr, mesh as mesh_mod

mesh = mesh_mod.make_mesh(D)
m = m_per * D
a = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (m, n))
                .astype(np.float32))
a = jax.device_put(a, mesh_mod.row_sharding(mesh))

def timeit(fn):
    q, r = fn(a); q.block_until_ready()       # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        q, r = fn(a); q.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best

rows = []
for name, fn in (
    ("dtsqr_allgather", lambda x: dtsqr.dtsqr(x, mesh, "fp32",
                                              tree="allgather")),
    ("dtsqr_butterfly", lambda x: dtsqr.dtsqr(x, mesh, "fp32",
                                              tree="butterfly")),
    ("dcholqr2", lambda x: dtsqr.dcholqr(x, mesh, "fp32",
                                         method="cholqr2")),
):
    t = timeit(lambda x, f=fn: jax.jit(f)(x))
    print(f"ROW,{D},{m_per},{n},{name},{t:.6e}", flush=True)
"""


def main():
    m_per, n = 1 << 16, 128
    out = ROOT / "data" / "dweak.csv"
    rows = ["D,m_per_device,n,driver,elapsed_time"]
    for D in (1, 2, 4, 8):
        r = subprocess.run(
            [sys.executable, "-c", CHILD,
             str(ROOT), str(D), str(m_per), str(n)],
            capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            print(f"D={D} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
            continue
        for line in r.stdout.splitlines():
            if line.startswith("ROW,"):
                rows.append(line[4:])
                print(line[4:], flush=True)
    out.write_text("\n".join(rows) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
