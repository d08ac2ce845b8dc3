#!/usr/bin/env python
"""Offline (CPU) oracle-agreement prediction for an encrypted run.

Mirrors scripts/run_encrypted_mnist.py's range/gain resolution exactly, then
Monte-Carlo-simulates the encrypted pipeline (utils/noise_sim.py) instead of
touching the device.  Use before long CIFAR sessions to forecast agreement
and localize which bootstrap boundary flips first (VERDICT r2 #1).

Usage: python scripts/predict_agreement.py --model cifar/binarynet_small \
           --images 16 --params small_v2_tpu --trials 5 [--per-layer]
Env:   REDSEC_INPUT_GAIN / REDSEC_CENTER / REDSEC_RELU_MODE as in the runner.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--model", default="cifar/binarynet_small")
    ap.add_argument("--params", default="small_v2_tpu")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--varprep", default="",
                    help="path to a var_prep.dat overriding the reference "
                         "net's shipped weights (BYON-trained weights)")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--per-layer", action="store_true")
    ap.add_argument("--exact-layers", default="",
                    help="comma list of layer indices to simulate noiselessly "
                         "(what-if flip localization)")
    ap.add_argument("--isolate", action="store_true",
                    help="per-boundary ISOLATED flip rates: for each layer, "
                         "one rollout with every OTHER layer noiseless — "
                         "separates local noise from upstream cascade")
    ap.add_argument("--majority", type=int, default=1,
                    help="simulate k-copy dithered-PBS majority voting on "
                         "sign-type boundaries (see noise_sim.simulate_forward)")
    ap.add_argument("--majority-from", type=int, default=0,
                    help="first layer index whose sign boundary replicates "
                         "the stream (earlier boundaries run single-PBS)")
    ap.add_argument("--majority-plan", default="",
                    help="per-layer vote counts 'i:k,j:k' overriding the "
                         "global --majority (mirrors REDSEC_MAJORITY_PLAN)")
    ap.add_argument("--escalate", default="",
                    help="comma list of layer indices whose sign-type PBS "
                         "runs at --escalate-params geometry (mirrors "
                         "REDSEC_ESCALATE)")
    ap.add_argument("--escalate-params", default="small_v2_n2048")
    ap.add_argument("--unit-gains", action="store_true",
                    help="forecast with encoding gains disabled (the "
                         "reference's hardwired +-1 message convention, "
                         "lib/BinOps_enc.cpp:182-186) — the mechanism-off "
                         "baseline")
    ap.add_argument("--no-range-check", action="store_true",
                    help="resolve with strict=False (mirror the runner's "
                         "flag): forecast nets whose margins trip the "
                         "REDSEC_MAX_FLIP guard instead of refusing")
    args = ap.parse_args()

    # OFFLINE predictor: force CPU even when the session env points JAX at
    # the tunneled TPU — this must be runnable alongside a chip session
    # without sharing (and crashing) the device worker.  The env var alone
    # is NOT enough: sitecustomize imports jax at interpreter start, which
    # latches JAX_PLATFORMS=axon — the config update after import is the
    # only override that sticks (measured the hard way: a concurrent
    # axon-initialized helper wedged the device worker mid-queue,
    # results/tpu_r5_queue.log 12:29 stage).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from redsec_tpu.crypto.params import get_params
    from redsec_tpu.formats.image_io import load_csv_dataset, pixel_transform_for
    from redsec_tpu.models.spec import prep_model
    from redsec_tpu.models.zoo import get_model
    from redsec_tpu.runtime.ptxt import build_forward
    from redsec_tpu.runtime.ranges import calibrate_ranges, resolve_pbs_ranges
    from redsec_tpu.utils import noise_sim as ns

    t0 = time.time()
    params = get_params(args.params)
    spec = get_model(args.model)
    vp = args.varprep or os.path.join(
        args.reference, "nets", args.model, "var_prep.dat")
    plan = prep_model(spec, vp)

    d = plan.in_dim
    dataset = ("cifar/cifar_data.csv" if args.model.startswith("cifar")
               else "mnist/mnist_data.csv")
    csv = os.path.join(args.reference, "nets", dataset)
    labels, px = load_csv_dataset(csv, d.h, d.w, d.in_dep, limit=args.images)
    x = pixel_transform_for(args.model)(px)

    calibrate_ranges(plan, x)
    info = resolve_pbs_ranges(
        plan, params.msg_space, strict=not args.no_range_check,
        gains=not args.unit_gains,
        input_gain=os.environ.get("REDSEC_INPUT_GAIN", "0") == "1",
        sigma_units=params.mod_switch_sigma_units())
    efr = {i: round(r.expected_flip_rate, 5) for i, r in info.items()
           if r.expected_flip_rate is not None}
    if efr:
        print(f"[{time.time()-t0:6.1f}s] predicted per-boundary flips: {efr}")
    print(f"[{time.time()-t0:6.1f}s] gains: "
          f"{ {i: (r.in_gain, r.out_gain) for i, r in info.items()} } "
          f"relu modes: { {i: r.relu_mode for i, r in info.items() if r.relu_mode} } "
          f"centers: { {i: int(np.abs(r.center).max()) for i, r in info.items() if r.center is not None} }")

    want = np.asarray(build_forward(plan)(jnp.asarray(x)))
    ptxt_preds = want.argmax(1)
    acc = float((ptxt_preds == labels).mean())
    print(f"[{time.time()-t0:6.1f}s] plaintext oracle accuracy: {acc:.3f}")

    if args.isolate:
        trace = ns.trace_oracle(plan, x)
        nl = len(plan.layers)
        iso = {}
        for i in range(nl):
            rng = np.random.default_rng(args.seed)
            _, stats = ns.simulate_forward(
                plan, x, params, info, rng, oracle_trace=trace,
                exact_layers=set(range(nl)) - {i})
            for k in (f"L{i}", f"L{i}.mp"):
                if k in stats:
                    iso[k] = round(stats[k]["rate"], 6)
        print("ISOLATE " + json.dumps(
            {"model": args.model, "params": args.params,
             "input_gain": os.environ.get("REDSEC_INPUT_GAIN", "0"),
             "isolated_flip_rates": iso,
             "gains": {i: (r.in_gain, r.out_gain) for i, r in info.items()},
             "seconds": round(time.time() - t0, 1)}))
        return

    exact = (set(int(s) for s in args.exact_layers.split(",") if s != "")
             or None)
    mplan = {int(i): int(k) for i, _, k in
             (it.partition(":") for it in args.majority_plan.split(","))
             if i.strip()} or None
    esc = {int(s) for s in args.escalate.split(",") if s.strip()} or None
    esc_p = get_params(args.escalate_params) if esc else None
    if exact is None:
        res = ns.agreement_estimate(plan, x, params, info, trials=args.trials,
                                    seed=args.seed, per_layer=args.per_layer,
                                    majority=args.majority,
                                    majority_from=args.majority_from,
                                    majority_plan=mplan,
                                    escalate=esc, escalate_params=esc_p)
        if args.majority > 1:
            res["majority"] = args.majority
            res["majority_from"] = args.majority_from
        if mplan:
            res["majority_plan"] = {str(i): k for i, k in sorted(mplan.items())}
        if esc:
            res["escalate"] = sorted(esc)
            res["escalate_params"] = args.escalate_params
    else:
        trace = ns.trace_oracle(plan, x)
        agrees, layer_rates = [], {}
        for t in range(args.trials):
            rng = np.random.default_rng(args.seed + t)
            scores, stats = ns.simulate_forward(
                plan, x, params, info, rng, oracle_trace=trace,
                exact_layers=exact)
            agrees.append(float((scores.argmax(1) == ptxt_preds).mean()))
            for k, v in stats.items():
                layer_rates.setdefault(k, []).append(v["rate"])
        res = {"agreement_mean": float(np.mean(agrees)),
               "agreement_min": float(np.min(agrees)),
               "trials": args.trials, "images": int(x.shape[0]),
               "exact_layers": sorted(exact),
               "layer_flip_rates": {k: round(float(np.mean(v)), 5)
                                    for k, v in layer_rates.items()}}
    res.update(model=args.model, params=args.params,
               input_gain=os.environ.get("REDSEC_INPUT_GAIN", "0"),
               oracle_accuracy=acc, seconds=round(time.time() - t0, 1))
    print("PREDICT " + json.dumps(res))


if __name__ == "__main__":
    main()
