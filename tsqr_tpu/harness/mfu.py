"""MFU analysis: useful-flops vs method-flops MXU utilization.

No direct reference analogue — the reference's TFLOPS metric
(test.cu:311-326) counts USEFUL QR flops, so its published axis (0-16
TFLOPS on a 112 fp16-TFLOP/s V100 = 14 % useful) silently hides the
correction multiplier.  This harness makes both sides explicit per
(n, mode, method):

* useful_tflops / useful_mfu — qr_flops(m, n) over elapsed time, against
  the chip's bf16 MXU peak: what a user's workload gets.
* method_tflops / method_mfu — the MXU passes the pipeline actually
  executes (flops.fused_mxu_passes * 2mn^2): how busy the MXU is.
* hbm_gbps — implied HBM bandwidth if the measured time were purely the
  pipeline's modeled traffic (flops.fused_hbm_bytes): > the physical
  bandwidth means the config is MXU-bound, well under it means
  overhead-bound.

The ">= 50 % MXU peak" BASELINE.json target is a USEFUL-flops statement;
it is reachable only where method == useful, i.e. CholeskyQR1 (4mn^2
method flops = the useful QR count) in a 1-pass mode (bf16) at n large
enough that 3 bf16-IO HBM passes cost less than 2 MXU passes
(n >~ 190 on v5e: 819 GB/s vs 197 TFLOP/s).  Corrected modes buy 24-bit
accuracy with a 6x pass multiplier, capping useful MFU near
4/(2*passes) by construction — the honest trade the reference's
fp32_tc_cor makes too.
"""

from __future__ import annotations

import sys
from typing import IO, Sequence

import jax
import jax.numpy as jnp

from tsqr_tpu.core import cholqr
from tsqr_tpu.harness import flops as flops_mod
from tsqr_tpu.utils import timing, validation

CSV_HEADER = ("m,n,compute_mode,method,variant,elapsed_time,orthogonality,"
              "useful_tflops,useful_mfu,method_tflops,method_mfu,hbm_gbps,"
              "flag")

# v5e single-chip peaks (public spec); override for other chips
MXU_PEAK_TFLOPS = 197.0
HBM_PEAK_GBPS = 819.0


def mfu_row(m: int, n: int, mode: str, method: str, variant: str = "safe",
            seed: int = 0) -> dict:
    from tsqr_tpu import modes
    from tsqr_tpu.core.cholqr import _fused_n_max

    fused = method.endswith("_fused")
    if fused and not (64 <= n <= _fused_n_max(modes.resolve(mode))):
        # outside this range the *_fused methods delegate to the XLA
        # variants — the fused pass/byte models below would describe a
        # pipeline that never ran.  sweep() retries with the XLA sibling
        # so the envelope has a measured row there too.
        raise ValueError(f"{method} delegates to XLA at n={n} for {mode}; "
                         f"no fused MFU row")
    io_dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    a = jax.random.uniform(jax.random.PRNGKey(seed), (m, n), jnp.float32,
                           -1, 1).astype(io_dtype)

    def fn(x):
        return cholqr.fastqr(x, mode, method=method, variant=variant)

    q, _ = jax.jit(fn)(a)
    orth = float(validation.orthogonality_accurate(q))
    # auto-scaled loops: sub-10-ms kernels chained only a few ms of
    # active time against the ~30 ms tunnel dispatch, so the
    # null-subtraction landed within dispatch jitter — the source of the
    # round-2 870 GB/s > spec row (see timing.time_fn_amortized_auto)
    t, _loops = timing.time_fn_amortized_auto(fn, a, reps=3)

    useful = flops_mod.qr_flops(m, n)
    if fused:
        passes = flops_mod.fused_mxu_passes(mode, method, variant)
        hbm = flops_mod.fused_hbm_bytes(m, n, mode, method, variant)
    else:
        passes = flops_mod.xla_mxu_passes(mode, method)
        hbm = flops_mod.xla_hbm_bytes(m, n, mode, method)
    method_fl = passes * 2.0 * m * n * n
    hbm_gbps = hbm / t / 1e9
    # physics self-check: implied bandwidth above spec means the byte
    # model or the timing is wrong for this row — flag, never silently
    # print (a flagged row is a measurement-campaign bug to chase)
    flag = ("bw_exceeds_spec" if hbm_gbps > 1.02 * HBM_PEAK_GBPS else "")
    return {"m": m, "n": n, "compute_mode": mode, "method": method,
            "variant": variant, "elapsed_time": t, "orthogonality": orth,
            "useful_tflops": useful / t / 1e12,
            "useful_mfu": useful / t / 1e12 / MXU_PEAK_TFLOPS,
            "method_tflops": method_fl / t / 1e12,
            "method_mfu": method_fl / t / 1e12 / MXU_PEAK_TFLOPS,
            "hbm_gbps": hbm_gbps, "flag": flag}


def format_row(r: dict) -> str:
    return (f"{r['m']},{r['n']},{r['compute_mode']},{r['method']},"
            f"{r['variant']},{r['elapsed_time']:.6e},"
            f"{r['orthogonality']:.3e},{r['useful_tflops']:.3f},"
            f"{r['useful_mfu']:.4f},{r['method_tflops']:.3f},"
            f"{r['method_mfu']:.4f},{r['hbm_gbps']:.1f},{r['flag']}")


def sweep(m: int = 1 << 20,
          ns: Sequence[int] = (128, 256, 512, 1024, 2048),
          configs: Sequence[tuple[str, str, str]] = (
              ("bf16", "cholqr1_fused", "safe"),
              ("bf16", "cholqr2_fused", "safe"),
              ("bf16_nocor", "cholqr2_fused", "safe"),
              ("bf16x3_cor", "cholqr2_fused", "safe"),
              ("bf16x6_cor", "cholqr2_fused", "safe"),
              ("bf16x6_cor", "cholqr2_fused", "fast"),
              ("bf16x6_cor", "cholqr2_fused", "fastest"),
              ("bf16x6_cor", "cholqr2_fused", "turbo"),
              ("bf16x6_cor", "cholqr1_fused", "safe"),
              ("bf16x6_cor", "cholqr3_fused", "safe"),
              ("bf16x6_cor", "cholqr3_fused", "compact"),
          ),
          out: IO = sys.stdout) -> list[dict]:
    print(CSV_HEADER, file=out, flush=True)
    rows = []
    for mode, method, variant in configs:
        for n in ns:
            # keep total elements bounded so every config fits HBM
            m_eff = min(m, (1 << 28) // n)
            try:
                row = mfu_row(m_eff, n, mode, method, variant)
            except ValueError as e:
                if "delegates to XLA" not in str(e) or variant != "safe":
                    # non-safe variants share the safe row's XLA sibling —
                    # skip silently to avoid duplicate fallback rows
                    if "delegates to XLA" not in str(e):
                        from tsqr_tpu.utils.status import exc_note
                        print(f"# error n={n} {mode}/{method}/{variant}: "
                              f"{exc_note(e)}", file=out, flush=True)
                    continue
                # measure the XLA sibling that actually runs there, under
                # its own pass/byte model — the envelope keeps a measured
                # row at every n (VERDICT r3 weak #8)
                try:
                    row = mfu_row(m_eff, n, mode, method[:-len("_fused")],
                                  "safe")
                except Exception as e2:
                    from tsqr_tpu.utils.status import exc_note
                    print(f"# error n={n} {mode}/{method}->xla: "
                          f"{exc_note(e2)}", file=out, flush=True)
                    continue
            except Exception as e:  # per-config containment
                from tsqr_tpu.utils.status import exc_note
                print(f"# error n={n} {mode}/{method}/{variant}: "
                      f"{exc_note(e)}", file=out, flush=True)
                continue
            rows.append(row)
            print(format_row(row), file=out, flush=True)
    return rows
