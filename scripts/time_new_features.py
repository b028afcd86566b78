"""On-chip timing rows for the round-4 feature additions: AD backward,
rank-revealing QR, randomized CholeskyQR, and batched (vmap) QR.
Appends to data/extras.csv
(item,m,n,elapsed_time,tflops,orthogonality,note).

Run on the real chip (chain10 / manually once the tunnel is healthy):

    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python scripts/time_new_features.py

Claims these rows back:
  * ad_backward_*: the AD rule costs two (m, n) GEMMs + (n, n)
    triangular solves on top of the forward (docs/API.md) — so
    value_and_grad should land near forward + ~2 corrected-Gram-passes'
    worth of time, NOT a rematerialized-pipeline multiple.
  * qrcp_*: pivoted_qr = sketch GEMM + small pivoting + fast-path QR;
    its overhead over bare qr_auto_fused is the sketch + O(n^3) pivot.
  * vmap_*: batching composes with the fast path at full throughput.
"""

import csv
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsqr_tpu.core import cholqr  # noqa: E402
from tsqr_tpu.core.auto import qr_auto_fused  # noqa: E402
from tsqr_tpu.models import qrcp  # noqa: E402
from tsqr_tpu.utils import timing  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data", "extras.csv")
MODE = "bf16x6_cor"


def _done() -> set:
    """Items already in extras.csv — a chain retry after a mid-script
    wedge must not duplicate landed rows."""
    try:
        with open(OUT) as f:
            return {ln.split(",")[0] for ln in f.read().splitlines()[1:]
                    if ln.strip() and not ln.startswith("#")}
    except OSError:
        return set()


def row(item, m, n, t, tflops="", orth="", note=""):
    with open(OUT, "a", newline="") as f:
        csv.writer(f).writerow(
            [item, m, n, f"{t:.6e}",
             f"{tflops:.3f}" if tflops != "" else "",
             f"{orth:.3e}" if orth != "" else "", note])
    print(f"{item}: {t * 1e3:.3f} ms  {tflops if tflops != '' else ''} "
          f"{note}", flush=True)


def main():
    m, n = 1 << 20, 128
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-1, 1, (m, n)).astype(np.float32))
    qr_flops = 2.0 * m * n * n  # one Gram-pass equivalent, the unit
    done = _done()

    def section(items, fn):
        """Run one measurement unless all its rows already landed; one
        failure (wedge/OOM surfaced as an exception) moves on so a
        retry only pays for what is missing."""
        if all(i in done for i in items):
            print(f"{items}: already measured — skip", flush=True)
            return
        try:
            fn()
        except Exception as e:
            with open(OUT, "a") as f:
                f.write(f"# error {items[0]}: {type(e).__name__}: "
                        f"{str(e)[:200]}\n")
            print(f"{items[0]} FAILED: {e}", flush=True)

    # forward baseline (the bench fast path) — always timed (later rows
    # report overhead relative to it), written only if missing
    fwd = lambda x: qr_auto_fused(x, MODE)
    t_f = timing.time_fn_amortized(fwd, a)
    if "ad_forward_ladder" not in done:
        row("ad_forward_ladder", m, n, t_f,
            tflops=qr_flops * 4 / t_f / 1e12,
            note="forward only, bf16x6_cor")

    def ad_bwd():
        # value_and_grad: forward + the custom rule backward
        loss = lambda x: jnp.sum(qr_auto_fused(x, MODE)[1] ** 2)
        vg = jax.jit(jax.value_and_grad(loss))
        t_g = timing.time_fn_amortized(vg, a)
        row("ad_value_and_grad_ladder", m, n, t_g,
            note=f"fwd+bwd; overhead {t_g / t_f:.2f}x fwd")
    section(("ad_value_and_grad_ladder",), ad_bwd)

    def qrcp_row():
        # rank-revealing QR vs its own QR baseline
        key = jax.random.PRNGKey(0)
        pq = jax.jit(lambda x, k: qrcp.pivoted_qr(x, k, MODE))
        t_p = timing.time_fn_amortized(lambda x: pq(x, key), a)
        q, r, piv, db = [np.asarray(o) for o in pq(a, key)]
        orth = float(np.linalg.norm(
            q.astype(np.float64).T @ q.astype(np.float64) - np.eye(n))
            / np.sqrt(n))
        row("qrcp_pivoted", m, n, t_p, orth=orth,
            note=f"overhead {t_p / t_f:.2f}x plain ladder")
    section(("qrcp_pivoted",), qrcp_row)

    def rand_row():
        # randomized CholeskyQR: the fixed-cost deep-kappa path.  Cost
        # model: sketch GEMM (l=2n -> 2 Gram-pass equivalents) + fp32
        # apply (1) + 2 CholeskyQR passes in the mode (~4 corrected) ~ 8
        # pass equivalents, INDEPENDENT of kappa (cholqr_iter pays ~12
        # m-scale passes from kappa=5e6; Householder tier-4 is ~150x) —
        # uniform A times it faithfully because the cost is
        # spectrum-free.
        rq = jax.jit(lambda x: cholqr.rand_cholqr(x, MODE))
        t_r = timing.time_fn_amortized(rq, a)
        q_r = np.asarray(rq(a)[0], np.float64)
        orth_r = float(np.linalg.norm(q_r.T @ q_r - np.eye(n))
                       / np.sqrt(n))
        row("rand_cholqr", m, n, t_r, tflops=qr_flops * 8 / t_r / 1e12,
            orth=orth_r,
            note=f"fixed-pass sketch path; {t_r / t_f:.2f}x ladder fwd")
    section(("rand_cholqr",), rand_row)

    def cca_row():
        # CCA consumer: two tall QRs + small SVD — the m-scale cost
        # should be ~2 ladder forwards ((n, n)-scale SVD/solves are
        # noise).  NB: `from tsqr_tpu.models import cca` would yield the
        # re-exported FUNCTION (it shadows the submodule); import from
        # the submodule.
        from tsqr_tpu.models.cca import cca as cca_fn
        yb = jnp.asarray(rng.uniform(-1, 1, (m, 64)).astype(np.float32))
        # method="cholqr2": even with impl="jnp" the TWO inline tree
        # programs serialized into one HLO exceed the tunnel's
        # remote-compile request-size cap (HTTP 413, measured twice
        # 2026-08-20); the pure-GEMM route keeps the whole CCA one
        # compact program with identical m-scale cost on these
        # well-conditioned views (kappa(uniform) ~ 2).
        cf = jax.jit(lambda x, y: cca_fn(x, y, mode=MODE,
                                         method="cholqr2")[0])
        t_c = timing.time_fn_amortized(lambda x: cf(x, yb), a)
        row("cca_128x64", m, n, t_c,
            note=f"two QRs + small SVD (cholqr2 route); "
                 f"{t_c / t_f:.2f}x ladder fwd")
    section(("cca_128x64",), cca_row)

    def vmap_row():
        # batched: 8 x (2^17, 128) panels through one vmapped fast path
        mb = 1 << 17
        ab = jnp.asarray(rng.uniform(-1, 1, (8, mb, n)).astype(np.float32))
        bf = jax.jit(jax.vmap(lambda x: cholqr.fastqr(x, MODE,
                                                      method="cholqr2")))
        t_b = timing.time_fn_amortized(bf, ab)
        row("vmap_fastqr_b8", 8 * mb, n, t_b,
            tflops=2.0 * 8 * mb * n * n * 4 / t_b / 1e12,
            note="8-way vmap cholqr2, per-batch 2^17")
    section(("vmap_fastqr_b8",), vmap_row)


if __name__ == "__main__":
    main()
