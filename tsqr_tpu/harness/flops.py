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
