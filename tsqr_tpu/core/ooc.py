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

import os
import pathlib
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from tsqr_tpu import modes
from tsqr_tpu.core import cholqr

Array = jax.Array


class OOCInterrupted(RuntimeError):
    """Raised by the fault-injection hook after a checkpoint was saved —
    the OOC analogue of the reference's numerical fault injection
    (experimental.cu min_exponent): a controlled failure at an exact
    chunk boundary, used to test that resume reproduces the
    uninterrupted run."""


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
    n_iters = {"cholqr1": 1, "cholqr2": 2, "cholqr3": 3,
               "cholqr_iter": None}[method]

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

    if method == "cholqr_iter":
        # deep-kappa matrix-free: the iterated shifted loop
        # (cholqr._iter_shifted_loop) with the chunk-regenerating Gram —
        # each pass is one streamed regeneration of A; under
        # ``reduce=psum`` (dqr_regen) the replicated Gram keeps every
        # device on the same trip count.
        if policy.mode in cholqr._CHEAP_DOT:
            # same contract as cholqr.cholqr_iter: a bf16-grade Gram's
            # noise floor defeats both exit signals, so the loop would
            # burn max_shifted full regenerations and return unconverged
            raise ValueError(
                "qr_regen(method='cholqr_iter'): the cheap-dot modes' "
                "Gram noise floor defeats the shifted-contraction "
                f"analysis; use corrected/fp32 modes (got "
                f"{policy.mode.value!r})")
        g0 = gram_pass(None)
        g0 = (g0 + g0.T) * 0.5

        def gram_of_f(f):
            g = gram_pass(f)
            return (g + g.T) * 0.5

        f, rt, g, _, _ = cholqr._iter_shifted_loop(
            g0, gram_of_f,
            lambda gg: cholqr._shift_value_fused(gg, n, chunk_rows),
            n, cholqr._iter_polish_k2(policy), 16)
        # single tail factor — applied as a SECOND dot in the metrics
        # pass so it multiplies the bitwise-recomputed x@F (composing it
        # into F would floor orthogonality at ~eps*kappa(A); see
        # cholqr.cholqr_iter's tail note)
        r2 = cholqr._chol_r(g)
        rinv_tail = cholqr._rinv(r2)
        rt = modes.mm_fp32(r2, rt)
        rinv_total, r_total = f, rt
    else:
        rinv_tail = None
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
        q = policy.mm(x, rinv_total)
        if rinv_tail is not None:
            q = policy.mm(q, rinv_tail)
        q = q.astype(policy.io_dtype)
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
    if rinv_tail is not None:
        # consumers apply ONE factor to their own chunks; the composed
        # product trades the by-construction exactness of the two-dot
        # metrics path for a single GEMM (orthogonality of consumer-
        # materialized Q floors at ~eps*kappa(A) — the metrics above
        # report the two-dot path)
        rinv_total = modes.mm_fp32(rinv_total, rinv_tail)
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
                   checkpoint: str | os.PathLike | None = None,
                   _fault_after: int | None = None,
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

    ``checkpoint=<path>`` makes the factorization RESUMABLE across
    process death (a beyond-HBM pass through the 0.04 GB/s test tunnel
    runs ~10-30 min and the tunnel wedges intermittently — a wedge cost
    a completed 33-min m=2^26 run in round 3; the reference's closest
    posture is per-row CSV flushing, test.cu:228).  Design: a chunk that
    may have been partially written can only be redone from an INTACT
    source, so under checkpointing every pass derives its input chunk
    from immutable ``a`` through the stored per-iteration R^-1 chain
    with the same io-dtype rounding — bit-identical to the sequential
    pass over the stored Q, and the same recompute trade the fused
    compact/turbo pipelines make in HBM.  Consequences: (1) the
    checkpoint stores only (n, n) accumulators + progress markers
    (~0.5 MB, atomically replaced after every chunk); (2) intermediate
    Q-write passes vanish — checkpointed cholqr{1,2,3} move
    {3,6,9}->{3,4,5} A-sized transfers; (3) ``out`` must not alias
    ``a`` and should be disk-backed (np.memmap) for cross-process
    resume.  On completion the checkpoint file is removed.
    ``_fault_after=k`` raises OOCInterrupted after the k-th chunk step
    (fault injection for the resume tests).
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

    # ---- checkpoint plumbing (every hook no-ops when checkpoint=None) --
    use_ck = checkpoint is not None
    state = None
    if use_ck:
        if out is None or out is a:
            raise ValueError(
                "checkpointing needs a separate (ideally disk-backed) "
                "`out`: a possibly-partially-written chunk can only be "
                "redone from an intact `a`")
        ckpath = pathlib.Path(checkpoint)
        header = np.array([m, n, n_iters, chunk_rows, int(metrics)],
                          np.int64)
        fp_row0 = np.asarray(a[0], np.float32)  # wrong-input resume guard
        if ckpath.exists():
            z = np.load(ckpath, allow_pickle=False)
            if (not np.array_equal(z["header"], header)
                    or str(z["mode"]) != policy.mode.value
                    or not np.array_equal(z["fp_row0"], fp_row0)):
                raise ValueError(f"checkpoint {ckpath} does not match "
                                 "this call's inputs/config")
            state = {k: z[k] for k in z.files}

    steps = 0
    _zn = np.zeros((n, n), np.float32)

    def _save(it, phase, next_lo, g_a, comp_a, r_a, rinvs_np):
        # atomic (tmp + rename) after EVERY chunk; ~0.5 MB of (n, n)
        # accumulators — noise against a multi-second chunk transfer
        nonlocal steps
        if not use_ck:
            return
        tmp = ckpath.with_suffix(".tmp.npz")
        np.savez(
            tmp, header=header, mode=np.asarray(policy.mode.value),
            fp_row0=fp_row0, it=np.int64(it), phase=np.int64(phase),
            chunk=np.int64(next_lo),
            g=np.asarray(g_a, np.float32),
            comp=np.asarray(comp_a, np.float32),
            r=np.asarray(r_a, np.float32),
            r_total=np.asarray(r_total, np.float32),
            rinvs=(np.stack(rinvs_np) if rinvs_np
                   else np.zeros((0, n, n), np.float32)),
            qtq=np.asarray(qtq if qtq is not None else 0.0, np.float32),
            comp_q=np.asarray(comp_q if comp_q is not None else 0.0,
                              np.float32),
            d2=np.asarray(d2 if d2 is not None else 0.0, np.float32),
            a2=np.asarray(a2 if a2 is not None else 0.0, np.float32))
        os.replace(tmp, ckpath)
        steps += 1
        if _fault_after is not None and steps >= _fault_after:
            raise OOCInterrupted(f"injected fault after {steps} steps")

    it0 = phase0 = chunk0 = 0
    rinvs_np: list[np.ndarray] = []
    rinv_devs: list[Array] = []
    if state is not None:
        it0, phase0 = int(state["it"]), int(state["phase"])
        chunk0 = int(state["chunk"])
        r_total = np.asarray(state["r_total"], np.float32)
        rinvs_np = [np.asarray(x) for x in state["rinvs"]]
        rinv_devs = [jnp.asarray(x) for x in rinvs_np]

    def _chain_chunk(lo, hi):
        # the CURRENT iteration's input chunk, recomputed from intact A
        # through the completed iterations' R^-1 chain — each hop pays
        # the same io-dtype rounding the stored-Q path would have, so
        # the values are bit-identical to the plain sequential passes
        x = jnp.asarray(a[lo:hi])
        for ri in rinv_devs:
            x = qpass_fn(x, ri)
        return x

    for it in range(it0, n_iters):
        last = it == n_iters - 1
        resume_here = state is not None and it == it0
        if resume_here and phase0 == 1:
            # gram phase of this iteration completed pre-crash;
            # r_total (restored) already includes this r
            r = np.asarray(state["r"], np.float32)
            rinv_dev = jnp.asarray(np.asarray(
                cholqr._rinv(jnp.asarray(r))))
        else:
            # --- Gram pass over host chunks (Kahan-compensated f32) ---
            if resume_here and phase0 == 0:
                g = jnp.asarray(state["g"])
                comp = jnp.asarray(state["comp"])
                c0 = chunk0
            else:
                g = jnp.zeros((n, n), jnp.float32)
                comp = jnp.zeros((n, n), jnp.float32)
                c0 = 0
            for lo, hi in _chunks(m, chunk_rows):
                if lo < c0:
                    continue
                xc = _chain_chunk(lo, hi) if use_ck \
                    else jnp.asarray(src[lo:hi])
                contrib = gram_fn(xc)
                g, comp = _kahan_add(g, comp, contrib)
                float(g[0, 0])  # backpressure (see docstring)
                _save(it, 0, hi, g, comp, _zn, rinvs_np)
            if it == 0 and method == "cholqr3":
                # the library's shift (the old trace-based form here was
                # up to n x over — measured 16x over on latms spectra,
                # cholqr.py:48-64)
                shift = cholqr._shift_value(g, m, n)
            else:
                shift = 0.0
            r = np.asarray(cholqr._chol_r(g, shift=shift))
            rinv_dev = jnp.asarray(np.asarray(
                cholqr._rinv(jnp.asarray(r))))
            r_total = r @ r_total
        if use_ck and not last:
            # recompute mode: intermediate Q never materializes — extend
            # the R^-1 chain instead (the pass-count saving in the
            # docstring; the next Gram pass derives its chunks from A)
            rinvs_np.append(np.asarray(rinv_dev))
            rinv_devs.append(rinv_dev)
            _save(it + 1, 0, 0, _zn, _zn, _zn, rinvs_np)
            continue
        rt_dev = jnp.asarray(np.triu(r)) if (metrics and last) else None
        if metrics and last:
            if resume_here and phase0 == 1:
                qtq = jnp.asarray(state["qtq"])
                comp_q = jnp.asarray(state["comp_q"])
                d2 = jnp.asarray(state["d2"])
                a2 = jnp.asarray(state["a2"])
            else:
                qtq = jnp.zeros((n, n), jnp.float32)
                comp_q = jnp.zeros((n, n), jnp.float32)
                d2 = jnp.zeros((), jnp.float32)
                a2 = jnp.zeros((), jnp.float32)
        # --- Q pass ---
        c0 = chunk0 if (resume_here and phase0 == 1) else 0
        for lo, hi in _chunks(m, chunk_rows):
            if lo < c0:
                continue
            xc = _chain_chunk(lo, hi) if use_ck \
                else jnp.asarray(src[lo:hi])
            if metrics and last:
                qc, qtq, comp_q, d2, a2 = qpass_metrics_fn(
                    xc, rinv_dev, rt_dev, qtq, comp_q, d2, a2)
                q_host[lo:hi] = np.asarray(qc)  # D2H is the sync
                del qc
            else:
                q_host[lo:hi] = np.asarray(qpass_fn(xc, rinv_dev))
            del xc
            _save(it, 1, hi, _zn, _zn, r, rinvs_np)
        src = q_host
    if use_ck and ckpath.exists():
        ckpath.unlink()  # completed — a later call starts fresh
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
        float(g[0, 0])  # backpressure: unbounded eager H2D staging
        # grew to 130 GB RSS at m=2^26 (qr_out_of_core docstring)
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
        float(d2)  # backpressure (see ooc_orthogonality)
    return float(jnp.sqrt(d2) / jnp.sqrt(a2))
