#!/usr/bin/env python
"""Fit the pass-floor cost model to a single-session sweep (VERDICT r3 #4).

The bundle sweep + ablations pinned this backend's bootstrap cost to
accumulator memory passes, not VPU flops (PERFORMANCE.md).  The round-4
single-session sweep (scripts/tpu_r4_passmodel.sh, controls drift 0.1%)
makes that quantitative with a TWO-REGIME BANDWIDTH MODEL:

    t_round(Y) = max( c0 + Y/BW_cache ,  c1 + Y/BW_spill )      [us]
    rate       = batch / (rounds * t_round)

where Y = bytes MATERIALIZED per blind-rotation round, computed
structurally from (batch, N, rows) and the round body's tensor ledger
(crypto/bootstrap.py): rotate output, int8 digits, forward-NTT domain
(the largest term), pointwise output, inverse NTTs, CRT/carry.  The two
regimes are the cache-resident and HBM-spilled working sets; the knee
falls out of the fit at ~250 MB/round (= the b512 working set, matching
the long-observed "batch 384-512 sweet spot").

Bundled rounds (REDSEC_BUNDLE=2) stream THREE accumulator-scale working
sets (rot(acc,ai), rot(acc,aj), rot(u,aj) and their 3*rows digit/NTT
volumes): empirically a bundled b512 round costs what a plain round at
3x batch costs (6452 vs 6508 us extrapolated, <1%), so Y scales the
whole-round volume by the rotate multiplicity.

Fit: regime A on the b128..b512 batch points, regime B on b768/b1024.
Everything else is PREDICTED.  Points with |residual| > 20% are flagged:
measured above model = unexplained headroom; below = unexplained cost.

Usage: python scripts/fit_passmodel.py [--log results/tpu_r4_passmodel.log]
Writes results/passmodel_fit.json (bench.py reads it for vs_passfloor).
"""

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redsec_tpu.crypto.params import get_params  # noqa: E402

BK_LIMBS = 4


def features(params_name: str, batch: int, bundle: int):
    """Structural per-round features: rounds/bootstrap and Y = bytes
    materialized per round (the tensor ledger of make_bootstrap_impl).

    Batches below 128 pad to the 128-lane vector width: the round-5 n2048
    sweep measured b64 at exactly half of b128's rate (73.5 vs 153.6
    boots/s, results/tpu_r5_n2048.log) — same per-round time, half the
    useful lanes — so Y is computed at max(batch, 128) while the rate
    denominator keeps the real batch."""
    p = get_params(params_name)
    B, N, rows = max(batch, 128), p.N, p.decomp_rows  # B: padded, Y only
    # Prime count comes from the ACTUAL NTT plan, not an assumed 2: the
    # bundled tpu2 plan genuinely needs a third CRT prime (its contraction
    # bound exceeds the 2-prime product — bootstrap._bootstrap_plan), which
    # scales the NTT-domain terms by 1.5x and IS the r4 "tpu2+bundled -30%"
    # anomaly (3-prime model 348 vs 340 measured at b512: +2%).
    from redsec_tpu.crypto import bootstrap as bs
    plan = bs._bootstrap_plan(p, bundled=(bundle == 2))
    primes = len(plan.primes) if plan is not None else 2
    mult = 3 if bundle == 2 else 1      # rotate/diff/digit multiplicity
    rounds = p.n // 2 if bundle == 2 else p.n
    acc = 2 * 4 * B * N                  # [B, 2, N] int32 r+w (rotate out)
    digits = B * rows * N                # int8 decompose output
    fwd = primes * 2 * 4 * B * rows * N  # NTT-domain dn, both primes, r+w
    pw = primes * 2 * 4 * B * 2 * BK_LIMBS * N   # pointwise out r+w
    intt = pw                                    # same shape back
    crt = 2 * 4 * B * 2 * N                      # torus delta + carry
    Y = mult * (acc + digits + fwd + pw + intt + crt)
    return {"rounds": rounds, "Y": float(Y), "batch": batch,
            "params": params_name, "bundle": bundle}


def model_t_round_us(Y: float, coef: dict) -> float:
    a = coef["floor_cache_us"] + Y / 1e6 / coef["bw_cache_MB_per_us"]
    b = coef["floor_spill_us"] + Y / 1e6 / coef["bw_spill_MB_per_us"]
    return max(a, b)


def predict_rate(params_name: str, batch: int, bundle: int, coef: dict):
    f = features(params_name, batch, bundle)
    t = model_t_round_us(f["Y"], coef)
    return 1e6 * f["batch"] / (t * f["rounds"])


def parse_log(path):
    pts, name = [], None
    for line in open(path):
        m = re.match(r"^=== (.+?)  \[", line)
        if m:
            name = m.group(1)
            continue
        if line.startswith("{") and name:
            pts.append((name, json.loads(line)))
            name = None
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="results/tpu_r4_passmodel.log")
    ap.add_argument("--out", default="results/passmodel_fit.json")
    args = ap.parse_args()

    rows = []
    for name, j in parse_log(args.log):
        bundle = 2 if "bundled" in name else 1
        f = features(j["params"], j["batch"], bundle)
        f["name"], f["rate"] = name, j["value"]
        f["t_round_us"] = 1e6 * f["batch"] / (f["rate"] * f["rounds"])
        rows.append(f)
    by = {r["name"]: r for r in rows}

    def line_fit(names):
        pts = [(by[n]["Y"] / 1e6, by[n]["t_round_us"]) for n in names]
        A = np.array([[1.0, x] for x, _ in pts])
        y = np.array([t for _, t in pts])
        c, *_ = np.linalg.lstsq(A, y, rcond=None)
        return float(c[0]), float(c[1])  # intercept us, slope us/MB

    cache_names = [n for n in ("tpu b128", "tpu b256", "tpu b384",
                               "control-a tpu b512") if n in by]
    spill_names = [n for n in ("tpu b768", "tpu b1024") if n in by]
    i_a, s_a = line_fit(cache_names)
    i_b, s_b = line_fit(spill_names)
    coef = {"floor_cache_us": i_a, "bw_cache_MB_per_us": 1.0 / s_a,
            "floor_spill_us": i_b, "bw_spill_MB_per_us": 1.0 / s_b}

    drift = [r["rate"] for r in rows if r["name"].startswith("control")]
    report = {"coef": coef,
              "fit_points": cache_names + spill_names,
              "session_drift": (max(drift) / min(drift)
                                if len(drift) > 1 else None),
              "points": []}
    print(f"regime A (cache): floor {i_a:.0f} us + Y / {1/s_a:.1f} MB/us "
          f"(~{1e3/s_a:.0f} GB/s)")
    print(f"regime B (spill): floor {i_b:.0f} us + Y / {1/s_b:.1f} MB/us "
          f"(~{1e3/s_b:.0f} GB/s)")
    knee = (i_a - i_b) / (s_b - s_a) if s_b != s_a else float("nan")
    print(f"knee at Y ~ {knee:.0f} MB/round; controls drift "
          f"{max(drift)/min(drift):.3f}x" if drift else "")
    print(f"{'point':24s} {'measured':>9s} {'model':>9s} {'resid':>7s}")
    for r in rows:
        t_pred = model_t_round_us(r["Y"], coef)
        rate_pred = 1e6 * r["batch"] / (t_pred * r["rounds"])
        resid = r["rate"] / rate_pred - 1
        tag = ("fit" if r["name"] in report["fit_points"] else
               ("<-- >20%" if abs(resid) > 0.2 else ""))
        print(f"{r['name']:24s} {r['rate']:9.1f} {rate_pred:9.1f} "
              f"{resid:+7.1%}  {tag}")
        report["points"].append(
            {"name": r["name"], "params": r["params"], "batch": r["batch"],
             "bundle": r["bundle"], "Y_MB": round(r["Y"] / 1e6, 1),
             "measured": r["rate"], "model": round(rate_pred, 1),
             "residual": round(resid, 4),
             "role": "fit" if r["name"] in report["fit_points"] else "predict"})
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
