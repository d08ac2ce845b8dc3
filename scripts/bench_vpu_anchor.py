#!/usr/bin/env python
"""Anchor the roofline denominator to a measurement (VERDICT r2 #9).

bench.py's vs_roofline divides measured bootstraps/s by an ANALYTIC roofline
that assumes VPU_INT_OPS_PER_SEC = 4e12 int32 lane-ops/s (spec-sheet v5e
class). This script measures what this backend actually achieves on two
deliberately VPU-bound kernels and prints the achieved fraction, so the
roofline gap can be split into (a) backend-vs-spec and (b) formulation loss:

1. dense fused int32 multiply-add chain — a single jitted program applying
   K dependent ``x*a+b`` steps to a VMEM-sized block: pure VPU arithmetic,
   no memory-pass structure, the closest thing to int32 speed-of-light.
2. the production radix-2 NTT at large batch (the bootstrap's dominant
   stage), converted to int-ops via the same 15-ops/butterfly constant the
   roofline uses.

Prints one JSON line; run on the TPU session and paste into PERFORMANCE.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp


def force(x):
    return np.asarray(x.reshape(-1)[:1])


def time_chain(fn, x, iters):
    acc = fn(x)
    force(acc)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fn(acc)
    force(acc)
    return (time.perf_counter() - t0) / iters


def bench_fma_chain(size_mb=8, k=256, iters=8):
    """K dependent int32 mul-adds over a size_mb block inside ONE program.

    2 ops per element per step; K large enough that the single load/store
    of the block is amortized to <2% of the arithmetic."""
    n = size_mb * (1 << 20) // 4

    @jax.jit
    def fn(x):
        for i in range(k):
            x = x * np.int32(1103515245 + 2 * i) + np.int32(12345 + i)
        return x

    x = jnp.arange(n, dtype=jnp.int32).reshape(-1, 128)
    dt = time_chain(fn, x, iters)
    ops = 2.0 * n * k
    return ops / dt, dt


def bench_ntt_rate(batch=8192, iters=4):
    from redsec_tpu.crypto import ntt

    N = 1024
    plan = ntt.make_plan(N, max_operand=4, limb_bits=8, accum=20)
    p = plan.primes[0]
    x = jax.jit(lambda k: jax.random.randint(
        k, (batch, N), 0, p, dtype=jnp.int32))(jax.random.PRNGKey(0))
    x.block_until_ready()
    # chain NTT -> (mod p stays in range) -> NTT ...
    fn = jax.jit(lambda v: ntt.ntt_device(v, plan, 0))
    dt = time_chain(fn, x, iters)
    bfly = N // 2 * int(np.log2(N))
    ops = batch * bfly * 15.0  # the roofline's OPS_PER_BUTTERFLY
    return ops / dt, dt, batch / dt


def main():
    from bench import VPU_INT_OPS_PER_SEC

    fma_rate, fma_dt = bench_fma_chain()
    ntt_rate, ntt_dt, polys = bench_ntt_rate()
    out = {
        "metric": "achieved_vpu_int_ops_per_sec",
        "assumed_roofline_ops_per_sec": VPU_INT_OPS_PER_SEC,
        "fma_chain": {
            "ops_per_sec": round(fma_rate / 1e9, 2),
            "unit": "Gop/s",
            "ms_per_pass": round(fma_dt * 1e3, 3),
            "fraction_of_assumed": round(fma_rate / VPU_INT_OPS_PER_SEC, 4),
        },
        "radix2_ntt": {
            "ops_per_sec": round(ntt_rate / 1e9, 2),
            "unit": "Gop/s (at 15 ops/butterfly)",
            "mpolys_per_sec": round(polys / 1e6, 3),
            "fraction_of_assumed": round(ntt_rate / VPU_INT_OPS_PER_SEC, 4),
        },
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
