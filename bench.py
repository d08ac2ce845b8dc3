#!/usr/bin/env python
"""Benchmark: gate bootstraps per second per chip (the BASELINE.json metric).

Measures BOTH shipped operating points by default — ``small_v2`` (the
reference CPU default, client/gen_secure_keyset.cpp:70-97) and
``small_v2_tpu`` (this backend's gadget: identical lattice security and
message space, Bg=2^5 x l=6; choosing backend-appropriate decomposition
parameters is what the reference's GPU backend does with (RED)cuFHE's fixed
gadget, lib/GPU/Layer.cuh). ``REDSEC_BENCH_PARAMS`` restricts to one point.

Prints ONE JSON line. ``vs_baseline`` is the headline rate divided by the
analytic VPU ROOFLINE for the headline parameter set (BASELINE.md target:
>= 80% of roofline), computed by the op-count model below — not a
hand-picked constant. ``points`` carries every measured point.

``vs_passfloor`` = measured rate / the structural pass-floor model's
predicted rate for the benched configuration (scripts/fit_passmodel.py;
constants from results/passmodel_fit.json, calibrated to that fit's
session — cross-session drift ~1.6x applies to the ratio).  ~1.0 means
the formulation sits ON the accumulator-pass floor; >1.2 would mean the
model under-explains the backend and needs refitting.

Anchor fields (definitions; same wording in PERFORMANCE.md):
- ``achieved_vpu_fraction`` = measured int32 FMA-chain rate / the 4e12
  int-ops/s spec denominator the roofline assumes — the fraction of the
  assumed VPU THIS backend reaches on any code, measured in-session.
- ``vs_achievable`` = vs_baseline / achieved_vpu_fraction — the bootstrap
  rate relative to the VPU-anchored achievable roofline.  The pair drifts
  together across sessions; quote them from one session.
"""

import json
import math
import os
import sys
import time

import numpy as np

# v5e-class VPU integer throughput assumed by the roofline (PERFORMANCE.md):
# 8 cores x 4 MXU-adjacent vector units ~ 4e12 int32 lane-ops/s.
VPU_INT_OPS_PER_SEC = 4.0e12
OPS_PER_BUTTERFLY = 15  # mod-mul (fp32-reciprocal trick) + add/sub + wrap
OPS_PER_POINTWISE = 22  # lazy int32 CRT MAC incl. limb recombination


def roofline_bootstraps_per_sec(p) -> float:
    """Analytic VPU op count per gate bootstrap for the CRT-NTT formulation
    (cost model in PERFORMANCE.md): n CMUX rounds of

    - forward NTTs of the decomposed accumulator: rows x 2 primes x
      (N/2 log2 N) butterflies,
    - pointwise multiply-accumulate against the BK: rows x 2 primes x N,
    - inverse NTTs + CRT recombination: (k+1) polys x 4 limbs x 2 primes,
    - rotation/decomposition/carry bookkeeping ~0.5M ops.
    """
    N, n, rows = p.N, p.n, p.decomp_rows
    bfly = N // 2 * int(math.log2(N))
    fwd = rows * 2 * bfly * OPS_PER_BUTTERFLY
    pw = rows * 2 * N * OPS_PER_POINTWISE
    inv = 2 * 4 * 2 * bfly * OPS_PER_BUTTERFLY + 2 * 4 * N * 6
    book = 0.5e6
    ops_per_bootstrap = n * (fwd + pw + inv + book)
    return VPU_INT_OPS_PER_SEC / ops_per_bootstrap


def measure_point(params_name: str, batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from redsec_tpu.crypto import bootstrap as bs
    from redsec_tpu.crypto import lwe
    from redsec_tpu.crypto.params import get_params
    from redsec_tpu.formats.keys import ensure_keyset

    params = get_params(params_name)
    bundle = int(os.environ.get("REDSEC_BUNDLE", "1"))
    sk, dkey = ensure_keyset(params_name, seed=0, bundle=bundle)
    unroll = int(os.environ.get("REDSEC_UNROLL", "1"))
    pbs = bs.make_batched_bootstrap(dkey, unroll)

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
    roof = roofline_bootstraps_per_sec(params)
    return {
        "bootstraps_per_sec": round(rate, 2),
        "roofline_bootstraps_per_sec": round(roof, 1),
        "vs_roofline": round(rate / roof, 4),
        "sign_accuracy": ok,
    }


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)

    only = os.environ.get("REDSEC_BENCH_PARAMS", "")
    batch = int(os.environ.get("REDSEC_BENCH_BATCH", "512"))
    iters = int(os.environ.get("REDSEC_BENCH_ITERS", "4"))
    names = [only] if only else ["small_v2_tpu", "small_v2"]

    points = {name: measure_point(name, batch, iters) for name in names}
    head = names[0]
    out = {
        "metric": "gate_bootstraps_per_sec_per_chip",
        "value": points[head]["bootstraps_per_sec"],
        "unit": "bootstraps/s",
        "vs_baseline": points[head]["vs_roofline"],
        "baseline": "analytic VPU roofline for the headline params "
                    f"({points[head]['roofline_bootstraps_per_sec']}/s); "
                    "BASELINE.md target >= 0.80",
        "params": head,
        "batch": batch,
        "points": points,
        "device": str(jax.devices()[0]),
    }
    # pass-floor model comparison (VERDICT r3 #4): predict this config's
    # rate from the committed structural fit and report measured/model
    fit_path = os.path.join(repo, "results", "passmodel_fit.json")
    if os.path.exists(fit_path):
        try:
            sys.path.insert(0, os.path.join(repo, "scripts"))
            from fit_passmodel import predict_rate

            with open(fit_path) as f:
                fit = json.load(f)
            bundle = int(os.environ.get("REDSEC_BUNDLE", "1"))
            model_rate = predict_rate(head, batch, bundle, fit["coef"])
            out["passfloor_model_rate"] = round(model_rate, 1)
            out["vs_passfloor"] = round(out["value"] / model_rate, 4)
        except Exception as e:  # noqa: BLE001 — model comparison is best-effort
            out["vs_passfloor"] = f"failed: {type(e).__name__}"
    if os.environ.get("REDSEC_BENCH_ANCHOR", "1") != "0":
        # Anchor the roofline denominator to a measurement (VERDICT r2 #9):
        # a deliberately VPU-bound fused int32 mul-add chain measures what
        # fraction of the assumed 4e12 int-ops/s THIS backend can reach at
        # all; vs_achievable = measured / (roofline * that fraction)
        # separates backend-vs-spec loss from formulation loss.
        try:
            sys.path.insert(0, os.path.join(repo, "scripts"))
            from bench_vpu_anchor import bench_fma_chain

            fma_rate, _ = bench_fma_chain(size_mb=8, k=128, iters=4)
            frac = fma_rate / VPU_INT_OPS_PER_SEC
            out["achieved_vpu_fraction"] = round(frac, 4)
            out["vs_achievable"] = round(
                min(out["vs_baseline"] / max(frac, 1e-9), 99.0), 4)
        except Exception as e:  # noqa: BLE001 — anchor is best-effort
            out["achieved_vpu_fraction"] = f"failed: {type(e).__name__}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
