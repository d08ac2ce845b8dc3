#!/usr/bin/env python
"""Fit the pass-floor cost model to a single-session sweep (VERDICT r3 #4).

Model: the bundle sweep + ablations pinned this backend's bootstrap cost to
ACCUMULATOR MEMORY PASSES, not VPU flops (PERFORMANCE.md).  This script
makes that quantitative.  Per blind-rotation round, three structural cost
features (counted from crypto/bootstrap.py, not fitted):

  A  — accumulator-class traversals: the fused rotate chains over [B, 2, N]
       plus the loop carry.  Plain round: 1 rotate + 1 carry = 2.  Bundled
       round: 3 rotates (rot(acc,ai), rot(acc,aj), rot(u,aj)) + 1 carry = 4
       (bootstrap.py:703-730 vs 739-749).
  R  — row transforms: forward-NTT rows x primes (work proportional to the
       decomposition row count; plain 2*rows, bundled 6*rows).
  Y  — bytes materialized per round (computed from B, N, rows, dtypes:
       rotate outputs, int8 digits, NTT-domain tensors, pointwise output,
       inverse NTTs, CRT/carry) — the bandwidth share.

  t_round = cA*A + cR*R + cY*Y          (least squares, coeffs >= 0)
  rate    = B / (rounds * t_round)

Fit on the same-session sweep (scripts/tpu_r4_passmodel.sh), report
predicted-vs-measured for every point, and write results/passmodel_fit.json
(bench.py reads it to report ``vs_passfloor``).  Points with |residual| >
20% are flagged: measured ABOVE model = unexplained headroom; measured
BELOW = unexplained cost.

Usage: python scripts/fit_passmodel.py [--log results/tpu_r4_passmodel.log]
"""

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redsec_tpu.crypto.params import get_params  # noqa: E402


def features(params_name: str, batch: int, bundle: int):
    """Structural per-round features (A, R, Y bytes) + rounds/bootstrap."""
    p = get_params(params_name)
    B, N, rows = batch, p.N, p.decomp_rows
    primes = 2
    if bundle == 2:
        rounds = p.n // 2
        A = 4.0                      # 3 rotates + carry
        rot_mult, row_mult = 3, 3    # u, v, w diffs; 3*rows digit rows
    else:
        rounds = p.n
        A = 2.0                      # 1 rotate + carry
        rot_mult, row_mult = 1, 1
    R = primes * rows * row_mult
    acc = 2 * 4 * B * N              # [B, 2, N] int32 r+w
    digits = B * rows * row_mult * N  # int8
    fwd = primes * 2 * 4 * B * rows * row_mult * N   # NTT dn i32 r+w
    pw = primes * 2 * 4 * B * 2 * 4 * N              # [B,2,limbs,N] i32 r+w
    intt = pw                                        # same shape back
    crt = 2 * 4 * B * 2 * N                          # torus delta r+w
    Y = (1 + rot_mult) * acc / 2 + digits + fwd + pw + intt + crt
    return {"rounds": rounds, "A": A, "R": float(R), "Y": float(Y),
            "batch": B, "params": params_name, "bundle": bundle}


def parse_log(path):
    pts = []
    name = None
    for line in open(path):
        m = re.match(r"^=== (.+?)  \[", line)
        if m:
            name = m.group(1)
            continue
        if line.startswith("{") and name:
            j = json.loads(line)
            pts.append((name, j))
            name = None
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="results/tpu_r4_passmodel.log")
    ap.add_argument("--out", default="results/passmodel_fit.json")
    ap.add_argument("--fit-on", default="",
                    help="comma list of point names to fit on (default: all "
                         "b512 points + n2048)")
    args = ap.parse_args()

    pts = parse_log(args.log)
    rows = []
    for name, j in pts:
        bundle = 2 if "bundled" in name else 1
        f = features(j["params"], j["batch"], bundle)
        f["name"] = name
        f["rate"] = j["value"]
        f["t_round_us"] = 1e6 * f["batch"] / (f["rate"] * f["rounds"])
        rows.append(f)

    drift = [r["rate"] for r in rows if r["name"].startswith("control")]
    fit_rows = [r for r in rows
                if (not args.fit_on and not r["name"].startswith("control-b"))
                or r["name"] in args.fit_on.split(",")]

    X = np.array([[r["A"], r["R"], r["Y"] / 1e6] for r in fit_rows])
    y = np.array([r["t_round_us"] for r in fit_rows])
    # nonnegative least squares by projected alternation (3 coeffs; simple
    # active-set: try unconstrained, zero out negatives, refit)
    idx = list(range(X.shape[1]))
    while True:
        c, *_ = np.linalg.lstsq(X[:, idx], y, rcond=None)
        if (c >= 0).all() or len(idx) == 1:
            break
        idx = [i for i, ci in zip(idx, c) if ci > 0] or idx[:1]
    coef = np.zeros(X.shape[1])
    coef[idx] = np.maximum(c, 0)

    report = {"coef_us": {"per_acc_pass": coef[0], "per_row_transform": coef[1],
                          "per_MB": coef[2]},
              "session_drift": (max(drift) / min(drift) if len(drift) > 1
                                else None),
              "points": []}
    print(f"fitted per-round cost (us): acc-pass {coef[0]:.1f}, "
          f"row-transform {coef[1]:.2f}, per-MB {coef[2]:.2f}")
    if len(drift) > 1:
        print(f"session drift (controls): {max(drift)/min(drift):.3f}x")
    print(f"{'point':24s} {'measured':>9s} {'model':>9s} {'resid':>7s}")
    for r in rows:
        t_pred = coef @ np.array([r["A"], r["R"], r["Y"] / 1e6])
        rate_pred = 1e6 * r["batch"] / (t_pred * r["rounds"])
        resid = r["rate"] / rate_pred - 1
        flag = "  <-- >20%" if abs(resid) > 0.2 else ""
        print(f"{r['name']:24s} {r['rate']:9.1f} {rate_pred:9.1f} "
              f"{resid:+7.1%}{flag}")
        report["points"].append(
            {"name": r["name"], "params": r["params"], "batch": r["batch"],
             "bundle": r["bundle"], "measured": r["rate"],
             "model": round(rate_pred, 1), "residual": round(resid, 4)})
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
