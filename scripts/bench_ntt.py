#!/usr/bin/env python
"""Microbenchmark: XLA NTT vs fused Pallas NTT on the current device."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from redsec_tpu.crypto import ntt
from redsec_tpu.crypto.pallas_ntt import ntt_pallas


def timeit(fn, args_list, warm=1):
    np.asarray(fn(args_list[0])[0, :1])  # compile + force via host fetch
    # chain-free but forced: time each call to completion via tiny fetch
    t0 = time.perf_counter()
    acc = None
    for a in args_list[warm:]:
        o = fn(a)
        acc = o if acc is None else acc + o  # dependency chain prevents elision
    np.asarray(acc[0, :1])
    return (time.perf_counter() - t0) / (len(args_list) - warm)


def main():
    N = 1024
    batch = int(os.environ.get("NTT_BENCH_BATCH", "8192"))
    plan = ntt.make_plan(N, max_operand=4, limb_bits=8, accum=20)
    pi, p = 0, plan.primes[0]
    # generate inputs ON DEVICE (host->device uploads dominate on tunneled
    # backends; 4 x 64MB would take minutes)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    gen = jax.jit(lambda k: jax.random.randint(k, (batch, N), 0, p, dtype=jnp.int32))
    xs = [gen(k) for k in keys]
    for x in xs:
        x.block_until_ready()

    xla_fn = jax.jit(lambda v: ntt.ntt_device(v, plan, pi))
    t_xla = timeit(xla_fn, xs)
    print(f"XLA NTT    : {t_xla*1e3:8.3f} ms / {batch} polys "
          f"({batch/t_xla/1e6:.2f} M poly/s)")

    for tile in (128, 256, 512):
        try:
            pal_fn = jax.jit(lambda v, tile=tile: ntt_pallas(v, plan, pi, tile=tile))
            t_pal = timeit(pal_fn, xs)
            print(f"Pallas t={tile:4d}: {t_pal*1e3:8.3f} ms "
                  f"({batch/t_pal/1e6:.2f} M poly/s)  speedup x{t_xla/t_pal:.2f}")
        except Exception as e:  # noqa: BLE001
            print(f"Pallas t={tile}: FAILED {type(e).__name__}: {str(e)[:120]}")

    # correctness spot check on device
    want = np.asarray(xla_fn(xs[0][:16]))
    got = np.asarray(ntt_pallas(xs[0][:16], plan, pi, tile=16))
    print("bit-exact:", np.array_equal(got, want))


if __name__ == "__main__":
    main()
