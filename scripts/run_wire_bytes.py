#!/usr/bin/env python
"""Bytes-on-wire table for the distributed drivers, from compiled HLO.

data/dweak.csv (CPU-mesh wall-clock) cannot serve as scaling evidence:
virtual host devices time-share one core, so elapsed time grows with D
from simulation overhead, not communication.  The communication claim
(dtsqr.py: cross-chip traffic is ~D*n^2 for the all-gather tree,
~log2(D)*n^2 for the butterfly, 2-3 n^2 allreduces for dcholqr —
INDEPENDENT of m) is a property of the compiled program, so this script
proves it directly: compile each driver on a D-device mesh, parse the
optimized HLO, and sum the bytes moved by every collective op.

Writes data/dwire.csv: D,m_per_device,n,driver,collective,count,mib_total.
Hardware-independent — the same HLO is what a real ICI mesh would run.

Each D runs in a subprocess (host-device-count XLA flag parses once).
"""

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

CHILD = r"""
import os, re, sys
root = sys.argv[1]
D = int(sys.argv[2]); m_per = int(sys.argv[3]); n = int(sys.argv[4])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={D}")
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, root)
import jax
import jax.numpy as jnp
import numpy as np
from tsqr_tpu.parallel import dtsqr, mesh as mesh_mod

mesh = mesh_mod.make_mesh(D)
m = m_per * D
a = jnp.zeros((m, n), jnp.float32)
a = jax.device_put(a, mesh_mod.row_sharding(mesh))

BYTES = {"f32": 4, "bf16": 2, "f64": 8, "f16": 2, "s32": 4, "u32": 4,
         "pred": 1, "s8": 1, "u8": 1}
# optimized-HLO collective ops: "%x = f32[2,128,128]{...} all-gather(...)"
PAT = re.compile(
    r"=\s*(?:\()?([a-z0-9]+)\[([0-9,]*)\][^ ]*\s+"
    r"(all-gather|all-reduce|collective-permute|reduce-scatter|"
    r"all-to-all)(?:-start)?\(")

def wire(fn):
    hlo = jax.jit(fn).lower(a).compile().as_text()
    out = {}
    for m_ in PAT.finditer(hlo):
        dt, dims, op = m_.group(1), m_.group(2), m_.group(3)
        elems = 1
        for d in dims.split(","):
            if d.strip():
                elems *= int(d)
        b = elems * BYTES.get(dt, 4)
        cnt, tot = out.get(op, (0, 0))
        out[op] = (cnt + 1, tot + b)
    return out

for name, fn in (
    ("dtsqr_allgather", lambda x: dtsqr.dtsqr(x, mesh, "fp32",
                                              tree="allgather")),
    ("dtsqr_butterfly", lambda x: dtsqr.dtsqr(x, mesh, "fp32",
                                              tree="butterfly")),
    ("dcholqr2", lambda x: dtsqr.dcholqr(x, mesh, "fp32",
                                         method="cholqr2")),
):
    for op, (cnt, tot) in sorted(wire(fn).items()):
        print(f"ROW,{D},{m_per},{n},{name},{op},{cnt},{tot/2**20:.4f}",
              flush=True)
"""


def main():
    m_per, n = 1 << 16, 128
    out = ROOT / "data" / "dwire.csv"
    rows = ["D,m_per_device,n,driver,collective,count,mib_total"]
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
