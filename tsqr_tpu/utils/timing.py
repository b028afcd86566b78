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
    leaves = jax.tree_util.tree_leaves(out)
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


def time_fn_amortized(fn: Callable, x, loops: int = 10, reps: int = 3) -> float:
    """Seconds per call of fn(x), amortizing dispatch latency.

    Chains ``loops`` applications inside ONE jitted program with a data
    dependence between iterations (a cheap input perturbation derived from
    the previous output prevents CSE from collapsing the chain), so a
    single round trip covers all of them.
    """

    @jax.jit
    def chained(x0):
        def body(carry, _):
            out = fn(carry)
            leaves = jax.tree_util.tree_leaves(out)
            bump = jnp.asarray(0.0, x0.dtype)
            for leaf in leaves:
                bump = bump + jnp.sum(leaf[..., :1, :1]).astype(x0.dtype) * 1e-12
            return x0 + bump, None

        out, _ = jax.lax.scan(body, x0, None, length=loops)
        return jnp.sum(out[..., :1])

    # measure the chained program and an empty-ish reference
    float(chained(x))  # warm-up/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(x))
        best = min(best, time.perf_counter() - t0)

    @jax.jit
    def null(x0):
        return jnp.sum(x0[..., :1])

    float(null(x))
    t_null = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(null(x))
        t_null = min(t_null, time.perf_counter() - t0)
    return max((best - t_null) / loops, 1e-9)
