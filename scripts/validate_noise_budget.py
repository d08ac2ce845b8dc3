#!/usr/bin/env python
"""Per-source experimental validation of utils/noise_budget.py (VERDICT r4
#4): measure each bootstrap output-noise source IN ISOLATION on the native
engine by zeroing the others, then compare against the analytic prediction.

Isolation levers (all exact, no engine changes):
- alpha_bk=0 / alpha_ks=0 keygen variants zero the key-sample terms;
- l*bg_bit >= 32 zeroes the gadget-truncation term;
- ks_t*ks_basebit >= 32 zeroes the KS-truncation term;
- sweeping ks_t at fixed everything-else scales ONLY the KS-truncation
  term (predicted x4 variance per dropped basebit*level bit-pair).

Usage: python scripts/validate_noise_budget.py [--count 256] [--quick]
Writes one line per experiment: predicted vs measured sigma (slots) with
the n-sample relative error, and PASS/FAIL at 3 combined-sigma.
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(p, count, seed=0):
    """Keygen + native bootstrap of `count` quarter-space values; returns
    (sigma_slots, mean_slots, n_decode_errors, secs)."""
    from redsec_tpu import native
    from redsec_tpu.crypto import bootstrap as bs
    from redsec_tpu.crypto import keygen as kg
    from redsec_tpu.crypto import lwe

    sk, cloud = kg.keygen(p, seed=seed)
    eng = native.NativeEngine(cloud)
    rng = np.random.default_rng(seed + 1)
    qspace = p.msg_space // 4
    vals = rng.integers(-qspace, qspace, size=count)
    vals[vals == 0] = 1
    ct = lwe.encrypt_integers(sk.lwe_key, vals, p, rng)
    tv = bs.const_test_vector(p, 1, p.msg_space)
    t0 = time.time()
    out = eng.bootstrap(ct, tv)
    dt = time.time() - t0
    dec = lwe.decrypt_integers(sk.lwe_key, out, p)
    want = np.where(vals >= 0, 1, -1)
    mu = int(lwe.mod_switch_to_torus32(np.array([1]), p.msg_space)[0])
    phase = lwe.lwe_phase(sk.lwe_key, out).astype(np.int64)
    serr = (phase - want * mu).astype(np.int32).astype(np.float64)
    slots = serr / (2**32 / p.msg_space)
    return (float(slots.std(ddof=1)), float(slots.mean()),
            int((dec != want).sum()), dt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=256)
    ap.add_argument("--quick", action="store_true",
                    help="skip the (slow) full medium/large geometries")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from redsec_tpu import native
    from redsec_tpu.crypto.params import PARAM_SETS
    from redsec_tpu.utils.noise_budget import budget

    if not native.available():
        print("native engine unavailable")
        return 1

    sv2 = PARAM_SETS["small_v2"]
    R = dataclasses.replace
    experiments = [
        # (label, params, note)
        ("sv2/total", sv2, "all sources (production set)"),
        ("sv2/bk-only", R(sv2, name="x1", alpha_ks=0.0, ks_basebit=4, ks_t=8,
                          alpha_enc=0.0),
         "alpha_ks=0, 32-bit KS precision -> BK noise + gadget only"),
        ("sv2/ks-trunc18", R(sv2, name="x2", alpha_bk=0.0, alpha_ks=0.0,
                             alpha_enc=0.0, ks_basebit=3, ks_t=6),
         "all alphas 0, KS precision 18 bits -> pure KS truncation"),
        ("sv2/ks-trunc21", R(sv2, name="x3", alpha_bk=0.0, alpha_ks=0.0,
                             alpha_enc=0.0, ks_basebit=3, ks_t=7),
         "21-bit KS precision: predicted sigma/8 of 18-bit"),
        ("sv2/gadget21", R(sv2, name="x4", alpha_bk=0.0, alpha_ks=0.0,
                           alpha_enc=0.0, bg_bit=3, l=7, ks_basebit=4, ks_t=8),
         "all alphas 0, 32-bit KS, 21-bit gadget -> pure gadget truncation"),
        ("sv2/ks-noise", R(sv2, name="x5", alpha_bk=0.0, alpha_enc=0.0,
                           ks_basebit=4, ks_t=8),
         "alpha_bk=0, 32-bit KS precision -> pure KS key noise (alpha_ks=2^-25)"),
        ("tpu2/total", PARAM_SETS["small_v2_tpu2"], "widest-base shipped set"),
    ]
    if not args.quick:
        experiments += [
            ("medium/total", PARAM_SETS["medium"], "reference medium recipe"),
            ("large/total", PARAM_SETS["large"], "reference large recipe"),
        ]

    print(f"count={args.count}  (sigma rel. err ~"
          f"{1/np.sqrt(2*(args.count-1)):.1%} per experiment)")
    hdr = (f"{'experiment':16} {'pred σ':>8} {'meas σ':>8} {'ratio':>6} "
           f"{'mean':>7} {'errs':>5} {'verdict':>8}")
    print(hdr + "\n" + "-" * len(hdr))
    results = []
    for label, p, note in experiments:
        n = args.count
        if p.n >= 3000:  # medium/large: single bootstrap ~1s+, cap count
            n = min(n, 64 if p.n < 5000 else 48)
        pred = budget(p).sigma_slots()
        sig, mean, errs, dt = measure(p, n, args.seed)
        rel = 1 / np.sqrt(2 * (n - 1))
        ratio = sig / pred if pred > 0 else float("inf")
        # PASS when measured is within 3 combined sigmas of predicted
        # (sampling error of a std estimate ~ rel * sigma)
        ok = abs(sig - pred) <= 3 * rel * max(sig, pred) if pred > 0 \
            else sig < 1e-3
        results.append((label, pred, sig, ratio, ok))
        print(f"{label:16} {pred:8.4f} {sig:8.4f} {ratio:6.2f} "
              f"{mean:+7.3f} {errs:5d} {'PASS' if ok else 'FAIL':>8}"
              f"   [{note}; {n} boots in {dt:.1f}s]", flush=True)
    bad = [r for r in results if not r[3] == r[3] or not r[4]]
    print("RESULT", {"experiments": len(results),
                     "pass": sum(1 for r in results if r[4]),
                     "fail": [r[0] for r in results if not r[4]]})
    return 0 if not bad else 2


if __name__ == "__main__":
    sys.exit(main())
