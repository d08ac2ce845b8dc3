#!/usr/bin/env python
"""Benchmark: gate bootstraps per second per chip (the BASELINE.json metric).

Runs the batched CGGI gate bootstrap at this backend's parameter point
``small_v2_tpu`` (n=350, N=1024 — identical lattice security and message
space to the reference's shipped CPU default small_v2; gadget base Bg=2^5 x
l=6, output noise test-asserted far below the shared mod-switch band,
tests/test_params_tpu.py). Choosing backend-appropriate decomposition
parameters is exactly what the reference does: its GPU backend runs
(RED)cuFHE's own fixed gadget (lib/GPU/Layer.cuh), not the CPU keyset.
REDSEC_BENCH_PARAMS=small_v2 benches the CPU-reference parameter point.

Prints ONE JSON line. vs_baseline is measured against 1000 bootstraps/sec —
the throughput class the reference's GPU backend needs to hit its
"inference in seconds" claim on MNIST sign1024x1 (~1220 bootstraps/image,
BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_BOOTSTRAPS_PER_SEC = 1000.0


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)

    from redsec_tpu.crypto import bootstrap as bs
    from redsec_tpu.crypto import lwe
    from redsec_tpu.crypto.params import get_params
    from redsec_tpu.formats.keys import ensure_keyset

    params_name = os.environ.get("REDSEC_BENCH_PARAMS", "small_v2_tpu")
    batch = int(os.environ.get("REDSEC_BENCH_BATCH", "512"))
    iters = int(os.environ.get("REDSEC_BENCH_ITERS", "4"))

    params = get_params(params_name)
    sk, dkey = ensure_keyset(params_name, seed=0)
    pbs = bs.make_batched_bootstrap(dkey)

    rng = np.random.default_rng(0)
    # distinct inputs per iteration: identical repeated calls can be served
    # from result caches on remote-execution backends
    vals = rng.integers(-1500, 1500, size=(iters + 1, batch))
    cts = [
        jnp.asarray(lwe.encrypt_integers(sk.lwe_key, v, params, rng)) for v in vals
    ]
    tv = jnp.asarray(bs.const_test_vector(params, 1, params.msg_space))

    out = pbs(cts[-1], tv)  # compile + warm up
    np.asarray(out)  # host fetch guarantees completion

    # Timing: CHAIN dependent bootstraps (each output +-1 LWE batch is a valid
    # input) and force the chain with a host fetch of one scalar — immune to
    # async dispatch, result caching, or non-blocking block_until_ready on
    # remote-execution backends.
    acc = cts[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = pbs(acc, tv)
    _ = np.asarray(acc[0, -1])  # tiny dependent fetch
    dt = time.perf_counter() - t0

    # correctness check on the warm-up output (independent inputs)
    dec = lwe.decrypt_integers(sk.lwe_key, np.asarray(out), params)
    ok = float((dec == np.where(vals[-1] >= 0, 1, -1)).mean())

    rate = batch * iters / dt
    print(json.dumps({
        "metric": "gate_bootstraps_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "bootstraps/s",
        "vs_baseline": round(rate / BASELINE_BOOTSTRAPS_PER_SEC, 4),
        "params": params_name,
        "batch": batch,
        "sign_accuracy": ok,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
