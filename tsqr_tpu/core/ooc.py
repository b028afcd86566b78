"""Out-of-core tall-skinny QR: m too large for HBM.

The reference benchmarks m up to 2^26 (main.cu sweep; BASELINE.md) — at
n=128 that is 34 GB (fp32) / 17 GB (bf16) for A alone, beyond a single
chip's 15.75 GB HBM.  The Gram-based methods stream naturally: G = sum of
per-chunk A_c^T A_c needs only one (chunk, n) tile on device at a time,
and each Q chunk is independent given R.  This driver keeps A in host
memory (numpy), streams chunks through the device, and writes Q chunks
back to host — the lax.scan row-chunking story of SURVEY.md §5 taken to
host scale.

Passes over A: cholqr1 = 2 reads + 1 write (the bf16-capacity config for
the reference's m=2^26 envelope edge); cholqr2 = 5; cholqr3 = 7 — same
pass structure as the on-device pipelines, just H2D/D2H instead of HBM.

Metrics at this scale must stream too (Q alone exceeds HBM):
``ooc_orthogonality`` / ``ooc_residual`` below accumulate the Gram /
difference norms chunk-wise on device with Kahan compensation.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from tsqr_tpu import modes
from tsqr_tpu.core import cholqr

Array = jax.Array


def _chunks(m: int, chunk: int):
    for lo in range(0, m, chunk):
        yield lo, min(lo + chunk, m)


def _kahan_add(g, comp, contrib):
    y = contrib - comp
    t = g + y
    return t, (t - g) - y


def qr_regen(gen_chunk: Callable[[int], Array],
             m: int, n: int,
             mode: modes.ComputeMode | str | modes.Policy = "bf16",
             method: str = "cholqr2",
             chunk_rows: int = 1 << 21,
             ) -> tuple[Array, dict]:
    """Matrix-free streamed QR: A is defined by a generator, never
    materialized — the device-resident route to the reference's m=2^26
    envelope edge (mk_performance_graph.py:40-49; at 2^26 x 128 even
    bf16 A exceeds the chip's HBM, and the tunnel makes host streaming
    ~0.04 GB/s, see qr_out_of_core).

    ``gen_chunk(i)`` must return chunk ``i`` of A, shape
    ``(chunk_rows, n)``, as a traced function of ``i`` (e.g. a
    ``jax.random`` draw keyed by ``fold_in``); it is called inside
    ``lax.fori_loop`` so every pass regenerates its chunks on the fly —
    the same recompute-instead-of-store trade as the fused "compact"
    pipelines (cholqr.cholqr3_fused), taken to beyond-HBM sizes.  Q is
    never stored either: the final pass computes each Q chunk, folds it
    into the quality metrics (Kahan-compensated Q^T Q and the relative
    residual), and discards it — a consumer wanting Q applies
    ``info["rinv"]`` to its own A chunks (one GEMM).

    Iterations compose in f32 (Q is only rounded to the policy io dtype
    in the final metrics pass), matching the composed-factor recompute
    pipelines rather than the store-and-reread host path.

    Returns ``(r, info)`` with ``info = {orthogonality, residual, rinv}``
    (metrics as 0-d device arrays — one float() each at the call site
    keeps the whole run at 3 host syncs total).
    """
    r, orth, resid, rinv = regen_program(gen_chunk, m, n, mode, method,
                                         chunk_rows)()
    return r, {"orthogonality": orth, "residual": resid, "rinv": rinv}


def regen_program(gen_chunk: Callable[[int], Array], m: int, n: int,
                  mode: modes.ComputeMode | str | modes.Policy = "bf16",
                  method: str = "cholqr2",
                  chunk_rows: int = 1 << 21) -> Callable[[], tuple]:
    """The jitted nullary program behind :func:`qr_regen`, returned so a
    benchmark can call it repeatedly WITHOUT re-tracing (each qr_regen
    call builds a fresh jit closure, so back-to-back qr_regen timing
    pays Python tracing + cache hashing inside the timed window).
    Returns () -> (r, orth, resid, rinv_total)."""
    policy = modes.resolve(mode)
    assert m % chunk_rows == 0, (m, chunk_rows)
    n_chunks = m // chunk_rows

    @jax.jit
    def run():
        return _regen_body(gen_chunk, n_chunks, n, chunk_rows, policy,
                           method)

    return run


def _regen_body(gen_chunk: Callable[[int], Array], n_chunks: int, n: int,
                chunk_rows: int, policy: modes.Policy, method: str,
                reduce: Callable[[Array], Array] = lambda x: x,
                ) -> tuple[Array, Array, Array, Array]:
    """Traced core of :func:`qr_regen`: (r, orth, resid, rinv_total).

    ``reduce`` wraps every cross-chunk (n, n)/scalar accumulation result:
    identity locally; ``lax.psum`` over the mesh row axis in
    ``parallel.dtsqr.dqr_regen``, where each device runs this body over
    its own chunk range — the psum'd Gram/metric accumulators are the
    ONLY communication (the same D-independent n^2 bound as dcholqr).
    """
    n_iters = {"cholqr1": 1, "cholqr2": 2, "cholqr3": 3}[method]

    def gram_pass(rinv_total):
        def body(i, carry):
            g, comp = carry
            x = gen_chunk(i).astype(jnp.float32)
            if rinv_total is not None:
                x = policy.mm(x, rinv_total)
            return _kahan_add(g, comp, modes.gram(x, policy))
        z = jnp.zeros((n, n), jnp.float32)
        g, _ = lax.fori_loop(0, n_chunks, body, (z, z))
        return reduce(g)

    rinv_total = None
    r_total = jnp.eye(n, dtype=jnp.float32)
    for it in range(n_iters):
        g = gram_pass(rinv_total)
        shift = (cholqr._shift_value_fused(g, n, chunk_rows)
                 if it == 0 and method == "cholqr3" else 0.0)
        r = cholqr._chol_r(g, shift=shift)
        rinv = cholqr._rinv(r)
        rinv_total = (rinv if rinv_total is None
                      else modes.mm_fp32(rinv_total, rinv))
        r_total = modes.mm_fp32(r, r_total)

    def metrics_body(i, carry):
        qtq, comp, d2, a2 = carry
        x = gen_chunk(i).astype(jnp.float32)
        q = policy.mm(x, rinv_total).astype(policy.io_dtype)
        q32 = q.astype(jnp.float32)
        contrib = lax.dot_general(
            q32, q32, (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        qtq, comp = _kahan_add(qtq, comp, contrib)
        d = x - jnp.matmul(q32, r_total,
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        return qtq, comp, d2 + jnp.sum(d * d), a2 + jnp.sum(x * x)

    z = jnp.zeros((n, n), jnp.float32)
    s = jnp.zeros((), jnp.float32)
    qtq, _, d2, a2 = lax.fori_loop(0, n_chunks, metrics_body,
                                   (z, z, s, s))
    qtq, d2, a2 = reduce(qtq), reduce(d2), reduce(a2)
    orth = jnp.linalg.norm(qtq - jnp.eye(n)) / jnp.sqrt(n * 1.0)
    resid = jnp.sqrt(d2) / jnp.sqrt(a2)
    return jnp.triu(r_total), orth, resid, rinv_total


def uniform_gen(key: Array, chunk_rows: int, n: int,
                dtype=jnp.bfloat16) -> Callable[[int], Array]:
    """Standard benchmark generator: chunk i = uniform(-1, 1) keyed by
    ``fold_in(key, i)`` — deterministic, order-independent, regenerable
    bitwise-identically in any pass.  Pass a ``jax.random.key(seed,
    impl="rbg")`` key on TPU: threefry generation at 2^26 x 128 costs
    more than the QR itself; rbg is hardware-rate."""
    def gen(i):
        return jax.random.uniform(jax.random.fold_in(key, i),
                                  (chunk_rows, n), jnp.float32,
                                  -1, 1).astype(dtype)
    return gen


def qr_out_of_core(a: np.ndarray,
                   mode: modes.ComputeMode | str = "fp32",
                   method: str = "cholqr3",
                   chunk_rows: int = 1 << 20,
                   out: np.ndarray | None = None,
                   metrics: bool = False,
                   ) -> tuple[np.ndarray, np.ndarray] | tuple[
                       np.ndarray, np.ndarray, dict]:
    """Thin QR of a host-resident (m, n) array, streamed through the chip.

    Returns (Q (m, n) host array in the mode's io dtype, R (n, n)).
    ``out`` optionally receives Q in place (may alias ``a`` to halve host
    memory — the host analogue of ``fastqr_inplace``).  ``a`` may be
    stored bf16 (ml_dtypes) to halve host memory and tunnel traffic; each
    chunk is upcast to f32 on device.

    ``metrics=True`` additionally returns ``{"orthogonality", "residual"}``
    accumulated ON DEVICE during the final Q pass, while the input chunk
    and its Q chunk are both already resident — zero extra passes over
    the data.  At beyond-HBM sizes this is the only affordable route: a
    separate ``ooc_residual`` pass re-streams 2 x m x n through the
    tunnel (and the in-place ``out=a`` case destroys A entirely).  The
    residual compares against the final pass's INPUT with its local
    factor: for cholqr1 that is exactly ||A - Q R||_F / ||A||_F; for
    cholqr2/3 it is the last refinement pass's residual (the earlier
    passes' residuals compose multiplicatively into R and are of the
    same order — measure against intact A via ``ooc_residual`` when the
    true composed residual is required).

    Every chunk step ends with a 1-element D2H sync: the tunnel client
    stages each async H2D in host memory and a loop of eagerly-enqueued
    transfers holds EVERY staging buffer live at once (measured: the
    m=2^26 residual pass grew to 130 GB RSS and was OOM-killed).  The
    sync bounds host memory at ~one chunk per step for ~30 ms/chunk —
    noise against the ~50 s/chunk transfer itself.
    """
    policy = modes.resolve(mode)
    m, n = a.shape
    assert m >= n
    n_iters = {"cholqr1": 1, "cholqr2": 2, "cholqr3": 3}[method]
    io_np = jnp.dtype(policy.io_dtype)

    gram_fn = jax.jit(lambda x: modes.gram(x.astype(jnp.float32), policy))
    qpass_fn = jax.jit(
        lambda x, ri: policy.mm(x.astype(jnp.float32), ri)
        .astype(policy.io_dtype))

    @jax.jit
    def qpass_metrics_fn(x, ri, rt, qtq, comp, d2, a2):
        x32 = x.astype(jnp.float32)
        q = policy.mm(x32, ri).astype(policy.io_dtype)
        q32 = q.astype(jnp.float32)
        contrib = lax.dot_general(q32, q32, (((0,), (0,)), ((), ())),
                                  precision=lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
        qtq, comp = _kahan_add(qtq, comp, contrib)
        d = x32 - jnp.matmul(q32, rt, precision=lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        return q, qtq, comp, d2 + jnp.sum(d * d), a2 + jnp.sum(x32 * x32)

    if out is not None:
        assert out.dtype == io_np, f"out must be {io_np}, got {out.dtype}"
        q_host = out
    else:
        q_host = np.empty((m, n), io_np)
    src = a
    r_total = np.eye(n, dtype=np.float32)
    qtq = comp_q = d2 = a2 = None

    for it in range(n_iters):
        last = it == n_iters - 1
        # --- Gram pass over host chunks (Kahan-compensated in f32) ---
        g = jnp.zeros((n, n), jnp.float32)
        comp = jnp.zeros((n, n), jnp.float32)
        for lo, hi in _chunks(m, chunk_rows):
            contrib = gram_fn(jnp.asarray(src[lo:hi]))
            g, comp = _kahan_add(g, comp, contrib)
            float(g[0, 0])  # backpressure (see docstring)
        if it == 0 and method == "cholqr3":
            # the library's shift (the old trace-based form here was up
            # to n x over — measured 16x over on latms spectra,
            # cholqr.py:48-64)
            shift = cholqr._shift_value(g, m, n)
        else:
            shift = 0.0
        r = np.asarray(cholqr._chol_r(g, shift=shift))
        rinv_dev = jnp.asarray(np.asarray(cholqr._rinv(jnp.asarray(r))))
        r_total = r @ r_total
        rt_dev = jnp.asarray(np.triu(r)) if (metrics and last) else None
        if metrics and last:
            qtq = jnp.zeros((n, n), jnp.float32)
            comp_q = jnp.zeros((n, n), jnp.float32)
            d2 = jnp.zeros((), jnp.float32)
            a2 = jnp.zeros((), jnp.float32)
        # --- Q pass ---
        for lo, hi in _chunks(m, chunk_rows):
            xc = jnp.asarray(src[lo:hi])
            if metrics and last:
                qc, qtq, comp_q, d2, a2 = qpass_metrics_fn(
                    xc, rinv_dev, rt_dev, qtq, comp_q, d2, a2)
                q_host[lo:hi] = np.asarray(qc)  # D2H is the sync
                del qc
            else:
                q_host[lo:hi] = np.asarray(qpass_fn(xc, rinv_dev))
            del xc
        src = q_host
    if not metrics:
        return q_host, np.triu(r_total)
    orth = float(jnp.linalg.norm(qtq - jnp.eye(n)) / jnp.sqrt(n * 1.0))
    resid = float(jnp.sqrt(d2) / jnp.sqrt(a2))
    return q_host, np.triu(r_total), {"orthogonality": orth,
                                      "residual": resid}


def ooc_orthogonality(q: np.ndarray, chunk_rows: int = 1 << 20) -> float:
    """||Q^T Q - I||_F / sqrt(n) for a host-resident Q, streamed through
    the device with Kahan-compensated Gram accumulation (measurement
    error ~ chunk-local, independent of m — same rationale as
    validation.orthogonality_accurate)."""
    m, n = q.shape
    gram_fn = jax.jit(lambda x: jnp.matmul(
        x.T, x, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32))
    g = jnp.zeros((n, n), jnp.float32)
    comp = jnp.zeros((n, n), jnp.float32)
    for lo, hi in _chunks(m, chunk_rows):
        contrib = gram_fn(jnp.asarray(q[lo:hi]).astype(jnp.float32))
        g, comp = _kahan_add(g, comp, contrib)
    return float(jnp.linalg.norm(g - jnp.eye(n)) / jnp.sqrt(n * 1.0))


def ooc_residual(a: np.ndarray, q: np.ndarray, r: np.ndarray,
                 chunk_rows: int = 1 << 20) -> float:
    """||A - QR||_F / ||A||_F for host-resident A, Q — chunk-streamed."""
    m, n = a.shape
    r_dev = jnp.asarray(np.asarray(r, np.float32))

    @jax.jit
    def step(ac, qc, r, d2, a2):
        ac = ac.astype(jnp.float32)
        d = ac - jnp.matmul(qc.astype(jnp.float32), r,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        return d2 + jnp.sum(d * d), a2 + jnp.sum(ac * ac)

    d2 = jnp.zeros((), jnp.float32)
    a2 = jnp.zeros((), jnp.float32)
    for lo, hi in _chunks(m, chunk_rows):
        d2, a2 = step(jnp.asarray(a[lo:hi]), jnp.asarray(q[lo:hi]),
                      r_dev, d2, a2)
    return float(jnp.sqrt(d2) / jnp.sqrt(a2))
