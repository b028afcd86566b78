"""Phase breakdown + tracing for BlockQR.

≙ the reference's PROFILE_BREAKDOWN[_CSV] compile-time switches
(blockqr.cu:6-7, 70-174, 363-385: chrono + stream syncs timing the
GEMM-0 / GEMM-1 / TSQR phases and printing a percentage breakdown), and
MEASURE_QR_TIME (tsqr.cu:24).  On TPU the phases are timed as separately
jitted programs at the same shapes (XLA fuses the real run more
aggressively, so this is an upper bound on phase cost), plus an optional
``jax.profiler`` trace for the real fused program.
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
    """Estimate the GEMM-vs-panel-QR split of one BlockQR call
    (≙ PROFILE_BREAKDOWN percentages, blockqr.cu:151-174)."""
    policy = modes.resolve(mode)
    nb = min(panel_width, n)
    a = jax.random.uniform(jax.random.PRNGKey(0), (m, n), jnp.float32, -1, 1)

    t_total = timing.time_fn_amortized(
        lambda x: blockqr.qr(x, policy, reorth=reorth,
                             panel_width=panel_width, **qr_kw),
        a, loops=4, reps=2)

    panel = a[:, :nb]
    t_tsqr = timing.time_fn_amortized(
        lambda x: tsqr_mod.tsqr(x[:, :nb], policy, **{
            k: v for k, v in qr_kw.items()
            if k in ("leaf_rows", "fanin", "impl")}),
        a, loops=4, reps=2)
    n_panels = -(-n // nb)
    t_tsqr_total = t_tsqr * n_panels * (2 if reorth else 1)

    # trailing GEMMs at the largest shape as the bound
    t_gemm = timing.time_fn_amortized(
        lambda x: policy.mm(x.T, x[:, :nb]), a, loops=4, reps=2)
    t_gemm_total = t_gemm * 2 * (n_panels - 1) * (2 if reorth else 1)

    result = {
        "total_s": t_total,
        "tsqr_est_s": t_tsqr_total,
        "gemm_est_s": t_gemm_total,
        "tsqr_pct": 100 * t_tsqr_total / t_total,
        "gemm_pct": 100 * t_gemm_total / t_total,
    }
    print(f"# blockqr breakdown m={m} n={n} mode={policy.name}: "
          f"total {t_total*1e3:.2f} ms, tsqr ~{result['tsqr_pct']:.0f}%, "
          f"gemm ~{result['gemm_pct']:.0f}%", file=out, flush=True)
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
