#!/usr/bin/env python
"""Train a margin-healthy mnist/relu1024x1 through the DoReFa/relu BYON leg
(VERDICT r4 #6): the staircase-STE trainer (compiler/train_relu.py) on the
100 shipped MNIST rows, exported through  var.dat1 -> weight_convert ->
var_prep.dat  — closing the BYON cycle for the reference's second
activation family (its Larq emitter covers relu twins,
/root/reference/compiler/compiler.py:310-328; Larq is absent here).

Usage: python scripts/train_relu_mnist.py [--steps 800]
Then:  scripts/tpu_r5_relu_trained.sh measures encrypted agreement.
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
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--edge-margin", type=float, default=0.35)
    ap.add_argument("--lam-edge", type=float, default=1.0)
    ap.add_argument("--logit-margin", type=float, default=24.0)
    ap.add_argument("--hidden-noise", type=float, default=1.0)
    ap.add_argument("--bound", type=float, default=900.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--model", default="mnist/relu1024x1")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out-dir", default="")
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")

    from redsec_tpu.compiler.train_relu import (
        ReluTrainConfig, train_and_export_relu)
    from redsec_tpu.formats.image_io import load_csv_dataset, pixel_transform_for
    from redsec_tpu.models.zoo import get_model

    spec = get_model(args.model)
    d = spec.input_dims
    csv = os.path.join(args.reference, "nets", "mnist/mnist_data.csv")
    labels, px = load_csv_dataset(csv, d.h, d.w, d.in_dep, limit=None)
    x = pixel_transform_for(args.model)(px)
    print(f"training {args.model} on {len(labels)} rows")

    cfg = ReluTrainConfig(steps=args.steps, lr=args.lr,
                          edge_margin=args.edge_margin, bound=args.bound,
                          lam_edge=args.lam_edge,
                          logit_margin=args.logit_margin,
                          hidden_noise=args.hidden_noise, seed=args.seed)
    raw, prep, report = train_and_export_relu(spec, x, labels, cfg)

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
    assert report["logits_bit_exact"], (
        "exported ptxt pipeline does not bit-match the trainer's hard walk")


if __name__ == "__main__":
    main()
