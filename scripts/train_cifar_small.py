#!/usr/bin/env python
"""Train margin-healthy cifar/binarynet_small weights (VERDICT r3 #1).

The engine's positive control: round 3 diagnosed the shipped CIFAR weights
as margin-limited (sub-noise sign margins cap oracle agreement at ~0.81 for
binarynet / 0.33 for binarynet_small), predicting that a margin-healthy
weight set runs at ~1.0 agreement on the SAME topology and engine.  This
script produces that weight set through the full BYON toolchain — the first
real exercise of  train -> var.dat1 -> weight_convert -> var_prep.dat
(/root/reference/compiler/README.md:29-53 flow; the reference trains a Larq
twin, nets/cifar/binarynet_small/net.cpp:118-209 is the inference side).

Trains on the 100 shipped CIFAR rows (the reference's own accuracy-harness
data), exports both files to nets_trained/cifar/binarynet_small/, then
forecasts encrypted oracle agreement with the validated noise simulator.

Usage: python scripts/train_cifar_small.py [--steps 1500]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
def main():
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--margin", type=float, default=6.0)
    ap.add_argument("--bound", type=float, default=80.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--model", default="cifar/binarynet_small")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out-dir", default="")
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"],
                    help="tpu: train on the chip with scan-chunked steps "
                         "(run SOLO — shares the one tunneled device)")
    ap.add_argument("--scan-chunk", type=int, default=-1,
                    help="steps per jitted scan segment (-1: 50 on tpu, "
                         "0 on cpu)")
    args = ap.parse_args()

    if args.device == "cpu":
        # keep the TPU chip free (and avoid crashing a concurrent encrypted
        # session): sitecustomize re-pins JAX_PLATFORMS=axon, so the only
        # reliable CPU forcing is the config update after import
        jax.config.update("jax_platforms", "cpu")
    scan = args.scan_chunk if args.scan_chunk >= 0 else (
        50 if args.device == "tpu" else 0)

    from redsec_tpu.compiler.train import TrainConfig, train_and_export
    from redsec_tpu.formats.image_io import load_csv_dataset, pixel_transform_for
    from redsec_tpu.models.zoo import get_model

    spec = get_model(args.model)
    d = spec.input_dims
    dataset = ("cifar/cifar_data.csv" if args.model.startswith("cifar")
               else "mnist/mnist_data.csv")
    csv = os.path.join(args.reference, "nets", dataset)
    labels, px = load_csv_dataset(csv, d.h, d.w, d.in_dep, limit=None)
    x = pixel_transform_for(args.model)(px)
    print(f"training {args.model} on {len(labels)} rows")

    cfg = TrainConfig(steps=args.steps, lr=args.lr, margin=args.margin,
                      bound=args.bound, seed=args.seed, scan_chunk=scan)
    raw, prep, report = train_and_export(spec, x, labels, cfg)

    out = args.out_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "nets_trained", args.model)
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "var.dat1"), "wb") as f:
        f.write(raw)
    with open(os.path.join(out, "var_prep.dat"), "wb") as f:
        f.write(prep)
    with open(os.path.join(out, "train_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}/var.dat1 ({len(raw)} B), var_prep.dat ({len(prep)} B)")
    print("TRAINREPORT " + json.dumps(
        {k: v for k, v in report.items() if k != "history"}))
    assert report["twin_vs_ptxt_agreement"] == 1.0, (
        "exported ptxt pipeline disagrees with the trainer's hard forward")


if __name__ == "__main__":
    main()
