#!/usr/bin/env python
"""Streaming-kernel bandwidth experiments (VERDICT r2 item 3).

Measures, on the real chip, with jitter-proof auto-scaled loop timing:
  1. speed-of-light probes: a pure-read reduce kernel and a read+write
     copy kernel at several chunk sizes (what the chip's DMA pipeline
     gives a gridded pallas kernel, no MXU work);
  2. the production Gram kernel's chunk sweep re-measured (the round-2
     571 GB/s @ 4096 figure was taken with loops=6 ~ 7 ms of active
     chain vs ~30 ms dispatch — within tunnel jitter);
  3. candidate compiler knobs: dimension_semantics=("arbitrary",).

Usage: python scripts/bw_experiments.py [--quick]
"""

import functools
import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsqr_tpu.utils import timing


_CSV = None  # set in main(): data/bw.csv


def _report(name, nbytes, t, loops):
    bw = nbytes / t / 1e9
    print(f"{name}: t={t*1e3:.3f} ms  bw={bw:.1f} GB/s  "
          f"(loops={loops})", flush=True)
    if _CSV is not None:
        _CSV.write(f"{name.replace(' ', '_')},{t:.6e},{bw:.1f},{loops}\n")
        _CSV.flush()


@functools.partial(jax.jit, static_argnames=("chunk", "arbitrary"))
def read_reduce(a, chunk=4096, arbitrary=False):
    """Pure-read probe: sum each (chunk, n) block into an (8, n) acc."""
    m, n = a.shape

    def kernel(a_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:, :] = jnp.zeros((8, n), jnp.float32)
        x = a_ref[:, :].astype(jnp.float32)
        o_ref[:, :] += x.reshape(-1, 8, n).sum(0)

    params = {}
    if arbitrary:
        params["dimension_semantics"] = ("arbitrary",)
    return pl.pallas_call(
        kernel,
        grid=(m // chunk,),
        in_specs=[pl.BlockSpec((chunk, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024, **params),
    )(a)


@functools.partial(jax.jit, static_argnames=("chunk",))
def copy_kernel(a, chunk=4096):
    """Read+write probe: y = x * 1.0000001 streamed."""
    m, n = a.shape

    def kernel(a_ref, o_ref):
        o_ref[:, :] = a_ref[:, :] * 1.0000001

    return pl.pallas_call(
        kernel,
        grid=(m // chunk,),
        in_specs=[pl.BlockSpec((chunk, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a)


def main():
    global _CSV
    quick = "--quick" in sys.argv
    _CSV = open(ROOT / "data" / "bw.csv", "w")
    _CSV.write("probe,elapsed_time,gbps,loops\n")
    m, n = (1 << 21, 128) if quick else (1 << 22, 128)
    key = jax.random.PRNGKey(0)
    a32 = jax.random.uniform(key, (m, n), jnp.float32, -1, 1)
    nbytes = m * n * 4

    print(f"== speed-of-light probes (m=2^{m.bit_length()-1}, n={n}, "
          f"f32) ==", flush=True)
    for chunk in (2048, 4096, 8192, 16384):
        t, loops = timing.time_fn_amortized_auto(
            lambda x, c=chunk: read_reduce(x, chunk=c), a32)
        _report(f"read_reduce chunk={chunk}", nbytes, t, loops)
    for chunk in (4096, 8192):
        t, loops = timing.time_fn_amortized_auto(
            lambda x, c=chunk: read_reduce(x, chunk=c, arbitrary=True), a32)
        _report(f"read_reduce(arb) chunk={chunk}", nbytes, t, loops)
    for chunk in (2048, 4096, 8192):
        t, loops = timing.time_fn_amortized_auto(
            lambda x, c=chunk: copy_kernel(x, chunk=c), a32)
        _report(f"copy chunk={chunk}", 2 * nbytes, t, loops)

    print("== production Gram kernel chunk sweep (bf16x6_cor) ==",
          flush=True)
    from tsqr_tpu.ops import pallas_gram
    for chunk in (2048, 4096, 8192, 16384):
        t, loops = timing.time_fn_amortized_auto(
            lambda x, c=chunk: pallas_gram.gram_pallas(
                x, "bf16x6_cor", chunk=c), a32)
        _report(f"gram x6 chunk={chunk}", nbytes, t, loops)
    for chunk in (4096, 8192, 16384):
        t, loops = timing.time_fn_amortized_auto(
            lambda x, c=chunk: pallas_gram.gram_pallas(
                x, "fp32", chunk=c), a32)
        _report(f"gram fp32 chunk={chunk}", nbytes, t, loops)
    # bf16 gram: 1 MXU pass — closest production analogue of pure read
    a16 = a32.astype(jnp.bfloat16)
    for chunk in (4096, 8192, 16384):
        t, loops = timing.time_fn_amortized_auto(
            lambda x, c=chunk: pallas_gram.gram_pallas(
                x, "bf16", chunk=c), a16)
        _report(f"gram bf16(bf16 in) chunk={chunk}", nbytes // 2, t, loops)

    print("== q-pass (read+write, 1 dot) ==", flush=True)
    rinv = jnp.eye(n, dtype=jnp.float32) * 1.001
    for chunk in (4096, 8192):
        t, loops = timing.time_fn_amortized_auto(
            lambda x, c=chunk: pallas_gram.stream_pallas(
                x, (rinv,), ("bf16x6_cor",), write_q=True, chunk=c,
                out_dtype=jnp.float32), a32)
        _report(f"qpass x6 chunk={chunk}", 2 * nbytes, t, loops)


if __name__ == "__main__":
    main()
