"""Application models built on the QR stack (no reference analogue —
the CUDA reference stops at QR; these are the factorization's standard
consumers, each routing all m-scale work through the library's
MXU-native fast paths and taking ``mesh=`` for multi-chip).

  * :func:`tsqr_svd` — deterministic thin SVD (QR + small SVD).
  * :func:`rsvd` — randomized SVD (sketch + TSQR orthogonalization).
  * :func:`block_lanczos` — block Lanczos with TSQR orthogonalization.
  * :func:`lstsq` — least squares via BlockQR (+ ridge via stacked QR).
  * :func:`lstsq_cgls` — matrix-free least squares: sketch-
    preconditioned CGLS, kappa-independent iteration count.
  * :func:`pivoted_qr` — rank-revealing QR (randomized column pivots).
  * :func:`interpolative` / :func:`cur` — column ID and CUR skeleton
    factorizations from the same sketch machinery.
  * :func:`polar` / :func:`procrustes` — QDWH polar decomposition and
    the orthogonal Procrustes rotation.
  * :func:`subspace_iteration` / :func:`nystrom` — top-k symmetric
    eigenpairs (orthogonal iteration + Rayleigh-Ritz) and one-shot
    randomized PSD approximation.
  * :func:`cca` — canonical correlation analysis (Björck–Golub: two
    tall QRs + small SVD of Qx^T Qy).
"""

from tsqr_tpu.models.svd import tsqr_svd
from tsqr_tpu.models.rsvd import rsvd
from tsqr_tpu.models.lanczos import block_lanczos
from tsqr_tpu.models.lstsq import lstsq, lstsq_cgls
from tsqr_tpu.models.qrcp import pivoted_qr, interpolative, cur
from tsqr_tpu.models.polar import polar, procrustes
from tsqr_tpu.models.subspace import subspace_iteration, nystrom
from tsqr_tpu.models.cca import cca

__all__ = ["tsqr_svd", "rsvd", "block_lanczos", "lstsq", "lstsq_cgls",
           "pivoted_qr", "interpolative", "cur",
           "polar", "procrustes", "subspace_iteration", "nystrom",
           "cca"]
