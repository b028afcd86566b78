"""Flop-count model for TFLOPS reporting.

≙ reference test.cu:311-326: the speed harness converts elapsed time to
TFLOPS via an explicit complexity model of TSQR + BlockQR (per 16-col panel:
bs*qr(m/bs,n) + (bs-1)*qr(2n,n) + (bs-1)*4n^3 + 4n^2*m, plus trailing-GEMM
flops).  Here the model follows our tree shape (configurable fan-in, MXU
leaves) so reported TFLOPS measure useful arithmetic, not padding.
"""

from __future__ import annotations

from tsqr_tpu.core import tsqr as tsqr_mod


def qr_flops(m: int, n: int) -> float:
    """Householder thin-QR flops (R + thin-Q build), standard count."""
    return 2.0 * m * n * n - (2.0 / 3.0) * n ** 3 + 2.0 * m * n * n


def tsqr_flops(m: int, n: int, leaf_rows: int = tsqr_mod.DEFAULT_LEAF_ROWS,
               fanin: int = tsqr_mod.DEFAULT_FANIN) -> float:
    """Total flops of the fused TSQR tree (forward QRs + backward GEMMs)."""
    bs, L, m_pad = tsqr_mod.plan_tree(m, n, leaf_rows, fanin)
    total = bs * qr_flops(L, n)                 # leaves
    b = bs
    while b > 1:
        f = min(fanin, b)
        total += (b // f) * qr_flops(f * n, n)  # forward node QRs
        total += (b // f) * 2.0 * (f * n) * n * n  # backward node GEMMs
        b //= f
    total += 2.0 * m_pad * n * n                # leaf-level backward GEMM
    return total


# ---------------------------------------------------------------------------
# MXU-pass / HBM-byte models of the fused CholeskyQR pipelines, for the MFU
# analysis (harness/mfu.py).  One "pass" = one rank-m MXU product of
# 2*m*n^2 flops (the unit the v5e MXU executes at bf16 rate).  fp32
# HIGHEST counts 6 (XLA's internal 6-pass bf16 decomposition on TPU).
# ---------------------------------------------------------------------------

DOT_PASSES = {"fp32": 6, "bf16": 1, "bf16_nocor": 1, "bf16x3_nocor": 3,
              "bf16x3_cor": 3, "bf16x6_cor": 6}
# symmetric half-Gram (ops/pallas_gram._gram_half): x6 4, x3 2
GRAM_PASSES = {"fp32": 6, "bf16": 1, "bf16_nocor": 1, "bf16x3_nocor": 3,
               "bf16x3_cor": 2, "bf16x6_cor": 4}
_CHEAP = ("bf16", "bf16_nocor", "bf16x3_nocor")
_DELTA = {"bf16x6_cor": 3, "fp32": 3}  # Delta-trick final-factor passes


def fused_mxu_passes(mode: str, method: str, variant: str = "safe") -> int:
    """MXU passes of the fused CholeskyQR pipelines (core/cholqr.py)."""
    g, d = GRAM_PASSES[mode], DOT_PASSES[mode]
    g1 = 1 if variant in ("fastest", "turbo") else g
    if method == "cholqr1_fused":
        return g + d
    if method == "cholqr2_fused":
        if mode in _CHEAP:
            # recompute pipeline; Gram #1 relaxes to 1 bf16 pass under
            # fastest/turbo exactly as in cholqr2_fused (g1_mode)
            return min(g, g1) + (d + g) + 2 * d
        if variant in ("compact", "turbo"):
            # recompute pipeline: G1 + (recompute-Q1 dot + G2) +
            # (recompute-Q1 dot + Delta final factor)
            return g1 + (d + g) + d + _DELTA.get(mode, d)
        last = _DELTA.get(mode, d) if variant != "safe" else d
        return g1 + (d + g) + last              # write-Q1 pipeline
    if method == "cholqr3_fused":
        if mode in _CHEAP:
            return min(g, g1) + (d + g) + (2 * d + g) + 3 * d
        if variant == "compact":
            # composed-factor recompute: G1 + mid (relaxed x3 dot +
            # full-grade half-gram) + (F2 dot + full gram) + (F2 dot +
            # Delta)
            rd = DOT_PASSES["bf16x3_cor"]
            return g + (rd + g) + (d + g) + d + _DELTA.get(mode, d)
        return g1 + (d + g) + (d + g) + _DELTA.get(mode, d)
    raise ValueError(method)


def fused_hbm_bytes(m: int, n: int, mode: str, method: str,
                    variant: str = "safe") -> int:
    """HBM bytes moved by the fused pipelines (m-scale traffic only)."""
    io = 2 if mode == "bf16" else 4
    mn = m * n
    if method == "cholqr1_fused":
        return io * mn * 3                      # rA (gram), rA + wQ
    if method == "cholqr2_fused":
        if mode in _CHEAP or variant in ("compact", "turbo"):
            return io * mn * 4                  # rA, rA, rA + wQ
        return io * mn * 5                      # rA, rA + wQ1, rQ1 + wQ
    if method == "cholqr3_fused":
        if mode in _CHEAP:
            return io * mn * 5
        if variant == "compact":
            return io * mn * 5                  # rA x4, wQ
        return io * mn * 7
    raise ValueError(method)


def xla_mxu_passes(mode: str, method: str) -> int:
    """MXU passes of the NON-fused (XLA) CholeskyQR paths.

    Each gram/dot under a corrected policy executes DOT_PASSES[mode]
    m-scale products (modes.gram's split products and policy.mm's split
    matmul both count d; fp32 HIGHEST decomposes to 6 in-MXU).  The
    ladder of methods is cholqr1 = gram+dot, cholqr2 = 2x, cholqr3 = 3x.
    """
    d = DOT_PASSES[mode]
    steps = {"cholqr1": 2, "cholqr2": 4, "cholqr3": 6}[method]
    return steps * d


def xla_hbm_bytes(m: int, n: int, mode: str, method: str) -> int:
    """MINIMAL algorithmic m-scale traffic of the XLA paths: each
    gram reads its input once, each Q-pass reads its input and writes
    its output.  Deliberately a LOWER bound — XLA additionally
    materializes the bf16 split parts for corrected modes, so the
    implied hbm_gbps UNDER-states true traffic and the bw_exceeds_spec
    physics flag stays conservative.  (At the n=2048 shapes this model
    serves, the pipelines are MXU-pass-bound and the implied bandwidth
    is far below spec regardless.)"""
    io = 2 if mode == "bf16" else 4
    touches = {"cholqr1": 3, "cholqr2": 6, "cholqr3": 9}[method]
    return io * m * n * touches


def blockqr_flops(m: int, n: int, panel_width: int,
                  leaf_rows: int = tsqr_mod.DEFAULT_LEAF_ROWS,
                  fanin: int = tsqr_mod.DEFAULT_FANIN,
                  reorth: bool = False) -> float:
    """BlockQR = per-panel TSQR + trailing GEMMs (≙ test.cu:311-326)."""
    nb = min(panel_width, n)
    n_blocks = -(-n // nb)
    total = 0.0
    for b in range(n_blocks):
        w = min(nb, n - b * nb)
        k = b * nb  # preceding columns
        mult = 2 if reorth and b > 0 else 1
        total += mult * tsqr_flops(m, w, leaf_rows, fanin)
        if b > 0:
            # R12 = Q^T A_b and A' = A_b - Q R12
            total += 2.0 * 2.0 * m * k * w
            if reorth:
                total += 2.0 * 2.0 * m * k * w  # S2 pass
                total += 2.0 * k * w * w + 2.0 * w ** 3  # R fix-ups
    return total
