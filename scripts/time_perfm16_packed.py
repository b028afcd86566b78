#!/usr/bin/env python
"""n=16 envelope rows for the SUBLANE-PACKED CholQR paths (round 5).

The reference's flagship sweep is m x 16 panels (main.cu:96-100).  At
n=16 the plain XLA CholQR streams 16/128-wide vregs and measured ~57x
off the HBM roofline (119.6 ms at 2^23 x 16, data/perf_m16.csv).  The
packed path (cholqr._pack_factor: view (m, 16) as (m/8, 128), Gram =
sum of diagonal blocks, apply via kron(I_8, R^-1)) runs every m-scale
pass 128 lanes wide.  This script appends `*/sbpack` rows to
data/perf_m16.csv (additive labels — the pre-pack rows stay as the
before/after evidence) for m = 2^16 .. 2^26, each m in a FRESH
subprocess above the OOM-risk threshold.

Resumable: (m, compute_mode) pairs already present are skipped.
"""

import os
import pathlib
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

OUT = ROOT / "data" / "perf_m16.csv"
N = 16

CHILD = """
import sys, time
sys.path.insert(0, {root!r})
import jax, jax.numpy as jnp
from tsqr_tpu.core import cholqr
from tsqr_tpu.harness import flops as flops_mod
from tsqr_tpu.utils import timing
m, n, mode, method = {m}, 16, {mode!r}, {method!r}
a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32, -1, 1)
fn = lambda x: cholqr.fastqr(x, mode, method=method)
q, r = fn(a)
float(jnp.sum(q[..., :1].astype(jnp.float32)))
del q, r
t, loops = timing.time_fn_amortized_auto(fn, a, reps=3, max_loops=4096,
                                         resolution_nan=True)
fl = flops_mod.qr_flops(m, n)
if t == t:
    print("ROW %d,16,float32,{label},0,%.6e,%.4f,0" % (m, t, fl / t / 1e12),
          flush=True)
else:
    print("SKIP %d {label}: below tunnel timing resolution at 4096 loops"
          % m, flush=True)
"""


def done_pairs() -> set:
    out = set()
    if OUT.exists():
        for ln in OUT.read_text().splitlines()[1:]:
            if ln.strip() and not ln.startswith("#"):
                parts = ln.split(",")
                out.add((parts[0], parts[3]))
    return out


def main() -> None:
    configs = [("bf16x6_cor", "cholqr2", "bf16x6_cor[cholqr2/sbpack]"),
               ("fp32", "cholqr2", "fp32[cholqr2/sbpack]"),
               ("bf16", "cholqr1", "bf16[cholqr1/sbpack]")]
    done = done_pairs()
    with open(OUT, "a") as f:
        for k in range(16, 27):
            m = 1 << k
            for mode, method, label in configs:
                if (str(m), label) in done:
                    print(f"m=2^{k} {label}: done — skip", flush=True)
                    continue
                if mode != "bf16" and m >= 1 << 26:
                    continue  # f32 A+Q at 2^26 x 16 = 8.6 GB + temps
                code = CHILD.replace("{label}", label).format(
                    root=str(ROOT), m=m, mode=mode, method=method)
                try:
                    res = subprocess.run([sys.executable, "-u", "-c", code],
                                         capture_output=True, text=True,
                                         timeout=1500, env=dict(os.environ))
                    rows = [ln[4:] for ln in res.stdout.splitlines()
                            if ln.startswith("ROW ")]
                    if not rows:
                        raise RuntimeError(
                            f"exit={res.returncode} "
                            f"stderr={res.stderr.strip()[-250:]}")
                    f.write(rows[-1] + "\n")
                    f.flush()
                    print(f"m=2^{k} {label}: {rows[-1]}", flush=True)
                except Exception as e:
                    note = " ".join(str(e).split())[:200]  # CSV = 1 line
                    f.write(f"# error {label} m={m}: {type(e).__name__}: "
                            f"{note}\n")
                    f.flush()
                    print(f"m=2^{k} {label} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
