"""Phase breakdown + tracing for BlockQR.

≙ the reference's PROFILE_BREAKDOWN[_CSV] compile-time switches
(blockqr.cu:6-7, 70-174, 363-385: chrono + stream syncs timing the
GEMM-0 / GEMM-1 / TSQR phases and printing a percentage breakdown), and
MEASURE_QR_TIME (tsqr.cu:24).  On TPU the phases of one fused program
cannot be clocked in-line, so each breakdown here is measured by REAL
-program ablation: the full program is timed against variants with one
phase ablated (see :func:`blockqr_breakdown`), so each phase cost is
what XLA actually scheduled for it.  An optional ``jax.profiler`` trace
covers the real fused program.
"""

from __future__ import annotations

import contextlib
import sys
from typing import IO

import jax
import jax.numpy as jnp

from tsqr_tpu import modes
from tsqr_tpu.core import blockqr, tsqr as tsqr_mod
from tsqr_tpu.utils import timing


def blockqr_breakdown(m: int, n: int, mode: str = "fp32",
                      panel_width: int = 128, reorth: bool = False,
                      out: IO = sys.stderr, **qr_kw) -> dict:
    """MEASURED panel-QR vs trailing-GEMM split of one BlockQR call
    (≙ PROFILE_BREAKDOWN percentages, blockqr.cu:151-174).

    The reference times the real phases in-line between stream syncs;
    under XLA the phases of one fused program cannot be clocked
    individually, so this differences THREE real fused programs instead:
    the full BlockQR, the same program with the panel factorizations
    ablated (``_ablate="no_panel"``: each panel returns (A', I)), and
    with the trailing projections ablated (``_ablate="no_project"``).
    Each phase cost is what XLA actually scheduled for it — same method
    as :func:`tsqr_phase_split`'s want_q ablation, unlike the
    separately-jitted upper-bound estimates this function computed
    before round 3.  ``other_s`` is the unattributed remainder
    (fix-up GEMMs, casts, fusion overlap between the phases)."""
    policy = modes.resolve(mode)
    a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32, -1, 1)

    def run(ablate):
        return timing.time_fn_amortized(
            lambda x: blockqr.qr(x, policy, reorth=reorth,
                                 panel_width=panel_width, _ablate=ablate,
                                 **qr_kw),
            a, loops=4, reps=2)

    t_total = run(None)
    t_panel = max(t_total - run("no_panel"), 0.0)
    t_gemm = max(t_total - run("no_project"), 0.0)
    result = {
        "total_s": t_total,
        "tsqr_s": t_panel,
        "gemm_s": t_gemm,
        "other_s": t_total - t_panel - t_gemm,
        "tsqr_pct": 100 * t_panel / t_total,
        "gemm_pct": 100 * t_gemm / t_total,
    }
    print(f"# blockqr breakdown m={m} n={n} mode={policy.name}: "
          f"total {t_total*1e3:.2f} ms, panel-QR {result['tsqr_pct']:.0f}%, "
          f"trailing-GEMM {result['gemm_pct']:.0f}% (measured by real-"
          f"program ablation)", file=out, flush=True)
    return result


def tsqr_phase_split(m: int, n: int, mode: str = "fp32",
                     out: IO = sys.stderr, **tsqr_kw) -> dict:
    """Compute-R vs compute-Q split of the REAL fused TSQR program
    (≙ MEASURE_QR_TIME, tsqr.cu:24, 1095-1098, 1269-1278).

    Times two real fused programs — the full tree and the forward-only
    tree (``want_q=False``, whose graph simply lacks the backward pass and
    the leaf Q-build it alone consumes) — so compute-Q = t(full) −
    t(R-only) reflects what XLA actually scheduled, unlike the
    separately-jitted estimates of :func:`blockqr_breakdown`."""
    policy = modes.resolve(mode)
    a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32, -1, 1)

    t_full = timing.time_fn_amortized(
        lambda x: tsqr_mod.tsqr(x, policy, **tsqr_kw), a, loops=4, reps=3)
    t_r = timing.time_fn_amortized(
        lambda x: tsqr_mod.tsqr(x, policy, want_q=False, **tsqr_kw),
        a, loops=4, reps=3)
    t_q = max(t_full - t_r, 0.0)
    result = {"total_s": t_full, "compute_r_s": t_r, "compute_q_s": t_q,
              "r_pct": 100 * t_r / t_full, "q_pct": 100 * t_q / t_full}
    print(f"# tsqr phase split m={m} n={n} mode={policy.name}: "
          f"total {t_full*1e3:.2f} ms, compute-R {t_r*1e3:.2f} ms "
          f"({result['r_pct']:.0f}%), compute-Q {t_q*1e3:.2f} ms "
          f"({result['q_pct']:.0f}%)", file=out, flush=True)
    return result


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tsqr_trace"):
    """jax.profiler trace context (the TPU-native tracing story)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
