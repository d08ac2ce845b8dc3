#!/usr/bin/env python
"""End-to-end encrypted inference (M4): client encrypt -> cloud run -> client
decrypt, compared against the plaintext oracle predictions.  Works for any
zoo model (mnist/sign*, mnist/relu*, cifar/*).

Usage: python scripts/run_encrypted_mnist.py [--images 8] [--model mnist/sign1024x1]
Env:   REDSEC_DEVICE=cpu to force the CPU backend.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--model", default="mnist/sign1024x1")
    ap.add_argument("--params", default="small_v2")
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if os.environ.get("REDSEC_DEVICE") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from redsec_tpu.formats.image_io import load_csv_dataset, pixel_transform_for
    from redsec_tpu.formats.keys import ensure_keyset
    from redsec_tpu.models.spec import prep_model
    from redsec_tpu.models.zoo import get_model
    from redsec_tpu.runtime.encrypted import (
        build_encrypted_forward, decrypt_scores, encrypt_images,
    )
    from redsec_tpu.runtime.ptxt import build_forward
    from redsec_tpu.utils.metrics import summarize

    t0 = time.time()
    sk, dkey = ensure_keyset(args.params, seed=0)
    print(f"[{time.time()-t0:6.1f}s] keys ready ({args.params})")

    spec = get_model(args.model)
    vp = os.path.join(args.reference, "nets", args.model, "var_prep.dat")
    plan = prep_model(spec, vp)
    stats = summarize(plan)
    print(f"[{time.time()-t0:6.1f}s] model {args.model}: "
          f"{stats['total_bootstraps']} bootstraps/image")

    d = plan.in_dim
    dataset = "cifar/cifar_data.csv" if args.model.startswith("cifar") else "mnist/mnist_data.csv"
    csv = os.path.join(args.reference, "nets", dataset)
    labels, px = load_csv_dataset(csv, d.h, d.w, d.in_dep, limit=args.images)
    x = pixel_transform_for(args.model)(px)

    want = np.asarray(build_forward(plan)(jnp.asarray(x)))
    ptxt_preds = want.argmax(1)

    rng = np.random.default_rng(0)
    ct = jnp.asarray(encrypt_images(sk, x, dkey.params, rng))
    fwd = build_encrypted_forward(plan, dkey)
    t1 = time.time()
    scores_ct = fwd(ct)
    scores_ct.block_until_ready()
    t_compile = time.time() - t1
    print(f"[{time.time()-t0:6.1f}s] first (compile+run) batch: {t_compile:.1f}s")
    t1 = time.time()
    scores_ct = fwd(ct)
    scores_ct.block_until_ready()
    dt = time.time() - t1
    per_img = dt / args.images
    scores = decrypt_scores(sk, scores_ct, dkey.params)
    preds = scores.argmax(1)

    agree = (preds == ptxt_preds).mean()
    acc = (preds == labels).mean()
    boots_rate = stats["total_bootstraps"] * args.images / dt
    print(f"Inference Time: {dt:.2f} seconds for {args.images} images "
          f"({per_img:.2f} s/image, {boots_rate:.0f} bootstraps/s)")
    print(f"encrypted preds: {preds.tolist()}")
    print(f"plaintext preds: {ptxt_preds.tolist()}")
    print(f"labels:          {labels.tolist()}")
    print(f"agreement with oracle: {agree:.3f}; accuracy: {acc:.3f}")


if __name__ == "__main__":
    main()
