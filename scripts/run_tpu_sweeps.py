#!/usr/bin/env python
"""Generate the measured-data artifacts on the real TPU chip.

Produces data/{accuracy,speed,cond,eval_q}.csv with the reference CSV
schemas (≙ the committed-but-empty CSVs under the reference's scripts/
directories — this repo commits actual measurements).

Run: python scripts/run_tpu_sweeps.py [--quick]
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

DATA = ROOT / "data"
DATA.mkdir(exist_ok=True)

MODES = ["fp32", "bf16_nocor", "bf16x3_cor", "bf16x6_cor"]


def main(quick: bool = False):
    from tsqr_tpu.harness import accuracy, cond, eval_q, speed
    from tsqr_tpu.utils import status

    status.print_banner()
    kw = dict(panel_width=128, leaf_rows=512)

    ms_acc = [1 << k for k in (12, 14, 16)]
    with open(DATA / "accuracy.csv", "w") as f:
        accuracy.sweep(ms_acc, [16, 128], MODES, trials=4 if quick else 8,
                       out=f, **kw)
    print("accuracy.csv done", file=sys.stderr, flush=True)

    with open(DATA / "eval_q.csv", "w") as f:
        eval_q.sweep(ms_acc, 128, MODES, reorths=(False,), out=f, **kw)
    print("eval_q.csv done", file=sys.stderr, flush=True)

    with open(DATA / "cond.csv", "w") as f:
        cond.sweep(1 << 14, 128, [2.0 ** k for k in range(2, 16, 2)],
                   ["fp32", "bf16x6_cor"], reorths=(False, True),
                   trials=2, out=f, **kw)
    print("cond.csv done", file=sys.stderr, flush=True)

    ms_speed = [1 << k for k in (16, 18, 20)]
    with open(DATA / "speed.csv", "w") as f:
        speed.sweep(ms_speed, [128], MODES, trials=4, out=f,
                    panel_method="cholqr2_fused", **kw)
    print("speed.csv done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
