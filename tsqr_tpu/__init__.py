"""tsqr-tpu: TPU-native tall-skinny QR (TSQR) + BlockQR library.

A from-scratch JAX/Pallas/pjit rebuild of the capabilities of the CUDA
reference ``enp1s0/tsqr-gpu`` ("TSQR on TensorCores", Ootomo & Yokota,
SC'19).  See SURVEY.md for the reference structural analysis this build
follows, and BASELINE.md for the measurement protocol.

Public API (≙ reference public headers blockqr.hpp / tsqr.hpp / tcqr.hpp):

  * :func:`tsqr_tpu.qr` — BlockQR of any (m, n), m >= n
    (≙ mtk::qr::qr, blockqr.hpp:142-175).
  * :func:`tsqr_tpu.tsqr` — TSQR of one tall-skinny panel
    (≙ mtk::tsqr::tsqr16, tsqr.hpp:108-140).
  * :func:`tsqr_tpu.panel_qr` — single-tile batched panel QR
    (≙ mtk::tcqr::qr32x16{,_batched}, tcqr.hpp:22-37).
  * :class:`tsqr_tpu.ComputeMode` — runtime precision modes
    (≙ the compute_mode template enums).
"""

from tsqr_tpu.modes import ComputeMode, Policy, resolve
from tsqr_tpu.core.tsqr import tsqr
from tsqr_tpu.core.blockqr import qr
from tsqr_tpu.core.cholqr import (fastqr, fastqr_inplace, pack_panel,
                                  qr_packed, unpack_panel)
from tsqr_tpu.core.auto import qr_auto, qr_auto_fused
from tsqr_tpu.ops.panel_qr import panel_qr

__version__ = "0.2.0"

__all__ = ["ComputeMode", "Policy", "resolve", "tsqr", "qr", "fastqr",
           "fastqr_inplace", "qr_auto", "qr_auto_fused", "panel_qr",
           "pack_panel", "qr_packed", "unpack_panel", "__version__"]
