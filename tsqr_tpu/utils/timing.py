"""Wall-clock timing that works on tunneled/async backends.

≙ utils.hpp:110-116 get_elapsed_time + the warm-up/timing discipline of the
speed harness (test.cu:290-309).  On the axon-tunneled TPU platform,
``block_until_ready`` returns immediately, so completion must be forced by
fetching a scalar derived from every output; inputs are rotated so no
caching layer can replay results.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _force(out) -> float:
    # optimization_barrier before slicing: today XLA keeps the full-size
    # work (verified in optimized HLO), but nothing else prevents a future
    # slice-sinking/DCE rewrite from eliding m-scale compute and inflating
    # reported throughput.
    leaves = jax.lax.optimization_barrier(jax.tree_util.tree_leaves(out))
    acc = 0.0
    for leaf in leaves:
        acc += float(jnp.sum(leaf[..., :1]))  # tiny slice: forces execution
    return acc


def time_fn(fn: Callable, inputs: Sequence, iters: int = 4,
            warmup: int = 2) -> float:
    """Best-effort steady-state seconds per call of fn(input).

    Includes one dispatch round trip — on a tunneled backend that adds a
    fixed ~30 ms; use time_fn_amortized for sub-round-trip kernels.
    """
    n_in = len(inputs)
    for i in range(warmup):
        _force(fn(inputs[i % n_in]))
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        _force(fn(inputs[i % n_in]))
        best = min(best, time.perf_counter() - t0)
    return best


def time_fn_amortized(fn: Callable, x, loops: int = 10, reps: int = 3,
                      resolution_nan: bool = False) -> float:
    """Seconds per call of fn(x), amortizing dispatch latency.

    Chains ``loops`` applications inside ONE jitted program, serialized by
    threading a scalar derived from each output into an
    ``optimization_barrier`` on the next iteration's input.  The barrier
    is free at runtime (identity, no copy) but makes every fn call's
    input a distinct value, so CSE/LICM cannot collapse the chain.

    (A previous version perturbed the full carry ``x0 + bump`` instead —
    that added a read+write of the whole operand per iteration, inflating
    every measurement by ~7 ms at 2^22 x 128 f32 on v5e and masking that
    the kernels were already bandwidth-saturated.)
    """

    def make_chain(f):
        @jax.jit
        def chained(x0):
            def body(carry, _):
                xc, acc = carry
                out = f(xc)
                # barrier before the slice so no simplifier pass can sink
                # the slice into f and elide m-scale work (see _force)
                leaves = jax.lax.optimization_barrier(
                    jax.tree_util.tree_leaves(out))
                acc2 = jnp.zeros((), jnp.float32)
                for leaf in leaves:
                    acc2 = acc2 + leaf.ravel()[0].astype(jnp.float32)
                # serialize iterations by touching ONE element of the
                # carry in place (dynamic_update_slice on a loop carry is
                # in-place in XLA while loops — no full-array traffic;
                # a plain optimization_barrier tying the input to acc is
                # NOT enough: XLA splits tuple barriers and hoists the
                # then-loop-invariant f out of the loop, measured).
                flat = xc.reshape(-1)
                upd = flat[:1] + (acc2 * 1e-30).astype(xc.dtype)
                xc2 = jax.lax.dynamic_update_slice(
                    flat, upd, (0,)).reshape(xc.shape)
                return (xc2, acc2), None

            (_, acc), _ = jax.lax.scan(
                body, (x0, jnp.zeros((), jnp.float32)), None, length=loops)
            return acc

        return chained

    def best_of(g):
        float(g(x))  # warm-up/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t_chain = best_of(make_chain(fn))
    # null chain with a trivial body: measures dispatch + scan + the
    # carry-touch overhead, subtracted so t reflects fn alone
    t_null = best_of(make_chain(lambda x0: x0.ravel()[:1] * 1.0))
    active = t_chain - t_null
    if resolution_nan and active < 0.05 * t_null:
        # The chain's active time is within the dispatch-jitter band of
        # the null chain (tunnel jitter ~1-2 ms against a ~30 ms round
        # trip): the subtraction is noise, not a measurement.  Evidence
        # writers opt in to NaN so no fabricated sub-nanosecond rows can
        # reach a CSV (round-4 perf_m16 had 1e-9 rows implying 783
        # TFLOP/s at 512x16); raise `loops` until active/null >= 5 %.
        return float("nan")
    return max(active / loops, 1e-9)


def time_fn_distinct(fn: Callable, xs: Sequence, reps: int = 3,
                     serialize: bool = True,
                     resolution_nan: bool = False) -> float:
    """Seconds per call of fn over K DISTINCT resident inputs.

    The dus-carry chain (time_fn_amortized) mis-measures programs that
    contain ``lax.cond``: measured on v5e at 2^22 x 128, a predictive
    two-branch program timed 4.2 ms against an ~8 ms HBM floor (work
    elided through the cond), and a three-tier ladder showed +8 ms that
    raw dispatch timing proves absent.  Here the chain is a plain
    UNROLLED Python loop over pre-generated distinct inputs inside one
    jit: no scan, no carry hack — CSE/LICM cannot collapse anything
    because every call's operand is a different array, and cross-call
    overlap is genuine pipelining.  (A scan over a stacked array does
    the same but pays a per-iteration materialization of the sliced
    input — +1.65 ms/loop measured at 2^20 x 128 f32.)

    All K inputs stay resident in HBM: at capacity shapes size K so that
    K * nbytes + ONE call's working set fits the chip (a device OOM
    poisons the whole process — CLAUDE.md).  A null chain on the same
    inputs is subtracted to remove dispatch latency.

    serialize=True (default) ties each call's input to the previous
    call's scalar through an ``optimization_barrier``, forcing the
    scheduler to run calls back-to-back.  Without it XLA may overlap
    calls: slightly lower time (legitimate pipelining) but K calls'
    temporaries alive at once — measured OOM at 2^21 x 128 x K=4 where
    the serialized chain fits comfortably.
    """

    @jax.jit
    def chained(*xt):
        acc = jnp.zeros((), jnp.float32)
        for x in xt:
            if serialize:
                x, acc = jax.lax.optimization_barrier((x, acc))
            out = fn(x)
            leaves = jax.lax.optimization_barrier(
                jax.tree_util.tree_leaves(out))
            for leaf in leaves:
                acc = acc + leaf.ravel()[0].astype(jnp.float32)
        return acc

    @jax.jit
    def null(*xt):
        acc = jnp.zeros((), jnp.float32)
        for x in xt:
            acc = acc + x.ravel()[0].astype(jnp.float32)
        return acc

    def best_of(g):
        float(g(*xs))  # warm-up/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(*xs))
            best = min(best, time.perf_counter() - t0)
        return best

    t_chain = best_of(chained)
    t_null = best_of(null)
    active = t_chain - t_null
    if resolution_nan and active < 0.05 * t_null:
        return float("nan")  # see time_fn_amortized: jitter, not signal
    return max(active / len(xs), 1e-9)


def time_fn_amortized_auto(fn: Callable, x, reps: int = 3,
                           min_active: float = 0.15,
                           max_loops: int = 4096,
                           resolution_nan: bool = False) -> tuple[float, int]:
    """time_fn_amortized with loops auto-scaled to the kernel's speed.

    The null-subtraction is only as good as the tunnel's dispatch jitter
    (~1-2 ms per round trip): a chain whose active time is a few ms
    against a ~30 ms dispatch measures within jitter — the round-2 MFU
    sweep's physically-impossible 870 GB/s row (m=2^20, n=128,
    t=1.2 ms x 6 loops = 7 ms active) came exactly from this.  Here a
    4-loop probe estimates t, then loops is rescaled so the chained
    active time is >= ``min_active`` seconds (>~ 75x the jitter).

    Returns (seconds_per_call, loops_used).
    """
    probe_loops = 4
    t_est = time_fn_amortized(fn, x, loops=probe_loops, reps=2,
                              resolution_nan=resolution_nan)
    if t_est != t_est:  # probe below resolution: assume microsecond-class
        t_est = 1e-6
    loops = max(probe_loops,
                min(max_loops, int(-(-min_active // max(t_est, 1e-6)))))
    return time_fn_amortized(fn, x, loops=loops, reps=reps,
                             resolution_nan=resolution_nan), loops
