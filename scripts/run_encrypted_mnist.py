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
    ap.add_argument("--varprep", default="",
                    help="path to a var_prep.dat overriding the reference "
                         "net's shipped weights (e.g. the BYON-trained "
                         "output of scripts/train_cifar_small.py)")
    ap.add_argument("--batch", type=int, default=0,
                    help="images per encrypted batch (0 = all at once)")
    ap.add_argument("--jit", default="auto")
    ap.add_argument("--pbs-chunk", type=int, default=512)
    ap.add_argument("--pbs-macro", type=int, default=16384)
    ap.add_argument("--no-range-check", action="store_true",
                    help="accept reference-style silent wrapping (toy params)")
    ap.add_argument("--checkpoint", default="",
                    help="JSON path: per-batch decrypted results persisted "
                         "after every batch, so a killed session resumes at "
                         "the next batch (VERDICT r3 #5: multi-hour CIFAR "
                         "runs vs session timeouts). Encryption randomness "
                         "is derived per batch index, so resumed batches "
                         "are bit-identical to an uninterrupted run.")
    args = ap.parse_args()
    import json

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
    vp = args.varprep or os.path.join(
        args.reference, "nets", args.model, "var_prep.dat")
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

    # data-driven PBS range bounds: picks the relu implementation per layer
    # and validates every bootstrap boundary (runtime/ranges.py)
    from redsec_tpu.runtime.ranges import calibrate_ranges, resolve_pbs_ranges

    calibrate_ranges(plan, x)
    info = resolve_pbs_ranges(plan, dkey.params.msg_space,
                              strict=not args.no_range_check,
                              input_gain=os.environ.get("REDSEC_INPUT_GAIN", "0") == "1",
                              sigma_units=dkey.params.mod_switch_sigma_units())
    efr = {i: round(r.expected_flip_rate, 5) for i, r in info.items()
           if r.expected_flip_rate is not None}
    if efr:
        print(f"[{time.time()-t0:6.1f}s] flip-optimal gains; predicted "
              f"per-boundary flip rates: {efr}")
    modes = {i: r.relu_mode for i, r in info.items() if r.relu_mode}
    if modes:
        print(f"[{time.time()-t0:6.1f}s] relu modes: {modes}")
    print(f"[{time.time()-t0:6.1f}s] encoding gains: "
          f"{ {i: (r.in_gain, r.out_gain) for i, r in info.items()} }"
          f" centers: { {i: int(np.abs(r.center).max()) for i, r in info.items() if r.center is not None} }")

    # per-boundary parameter escalation (REDSEC_ESCALATE="6,7"): the listed
    # layers' sign-type PBS runs through a second cloud key at
    # REDSEC_ESCALATE_PARAMS geometry; same-seed keygen shares the client
    # LWE key so ciphertexts are interchangeable between the keys
    escalate = None
    from redsec_tpu.runtime.encrypted import escalation_config

    esc_layers, esc_name = escalation_config()
    if esc_layers:
        sk2, dkey2 = ensure_keyset(esc_name, seed=0)
        assert np.array_equal(sk2.lwe_key, sk.lwe_key), \
            "escalation keyset does not share the client LWE key"
        escalate = (esc_layers, dkey2)
        print(f"[{time.time()-t0:6.1f}s] escalation: layers "
              f"{sorted(esc_layers)} -> {esc_name}")

    fwd = build_encrypted_forward(plan, dkey, jit=args.jit,
                                  pbs_chunk=args.pbs_chunk,
                                  pbs_macro=args.pbs_macro,
                                  range_check=not args.no_range_check,
                                  escalate=escalate)
    nb = args.batch or args.images

    def run_batch(xb, i0=0):
        """Encrypt -> cloud forward -> decrypt; the host fetch inside
        decrypt forces completion (block_until_ready is unreliable on
        remote-execution backends). Returns (preds, seconds).  Encryption
        randomness is seeded by the batch's first image index, so any
        batch's ciphertexts are reproducible in isolation (resume)."""
        rng = np.random.default_rng(1_000_003 + i0)
        ct = jnp.asarray(encrypt_images(sk, xb, dkey.params, rng,
                                        gain=getattr(fwd, "in_gain", 1)))
        t1 = time.time()
        scores = decrypt_scores(sk, np.asarray(fwd(ct)), dkey.params,
                                getattr(fwd, 'out_gain', 1),
                                getattr(fwd, 'out_center', None))
        return scores.argmax(1), time.time() - t1

    # per-batch checkpoint/resume: results live in a JSON file keyed by
    # batch start index, fingerprinted by the run configuration so a stale
    # file cannot silently mix configurations
    fingerprint = {
        "model": args.model, "params": args.params, "images": args.images,
        "batch": nb, "jit": args.jit,
        "input_gain": os.environ.get("REDSEC_INPUT_GAIN", "0"),
        "majority_plan": os.environ.get("REDSEC_MAJORITY_PLAN", ""),
        "escalate": os.environ.get("REDSEC_ESCALATE", ""),
        "varprep": vp,
    }
    ck = {"fingerprint": fingerprint, "batches": {}}
    if args.checkpoint and os.path.exists(args.checkpoint):
        with open(args.checkpoint) as f:
            prev = json.load(f)
        if prev.get("fingerprint") != fingerprint:
            raise SystemExit(
                f"checkpoint {args.checkpoint} was written by a different "
                f"configuration:\n  {prev.get('fingerprint')}\nvs\n  {fingerprint}")
        ck = prev
        done = sorted(int(k) for k in ck["batches"])
        print(f"[{time.time()-t0:6.1f}s] resuming: "
              f"{len(done)} batch(es) already done {done}")

    def save_checkpoint():
        if not args.checkpoint:
            return
        tmp = args.checkpoint + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ck, f)
        os.replace(tmp, args.checkpoint)

    # first batch pays compilation; rerun it warm so timing is clean.
    # REDSEC_TIME_MODE=cold skips the warm-up pass: the timed loop's first
    # batch then INCLUDES compilation (s/image is compile-inflated; the
    # RESULT line says so).  Used for session-budgeted flagship runs where
    # oracle agreement is the deliverable and the steady-state throughput
    # is already established (e.g. CIFAR staged at 864 boots/s, round 2).
    # Caveat (ADVICE r3): the persistent jax_compilation_cache_dir set
    # above can absorb part or all of compilation depending on prior runs,
    # so "cold" timing is NOT reproducible across cache states — treat it
    # as an upper bound on warm timing, not a defined quantity.
    cold = os.environ.get("REDSEC_TIME_MODE") == "cold"
    pending = [i0 for i0 in range(0, args.images, nb)
               if str(i0) not in ck["batches"]]
    if not cold and pending:
        _, t_compile = run_batch(x[pending[0] : pending[0] + nb], pending[0])
        print(f"[{time.time()-t0:6.1f}s] first (compile+run) batch: "
              f"{t_compile:.1f}s")
    all_preds, dt, n_resumed = [], 0.0, 0
    for i0 in range(0, args.images, nb):
        if str(i0) in ck["batches"]:
            rec = ck["batches"][str(i0)]
            p, step = np.asarray(rec["preds"]), rec["secs"]
            n_resumed += 1
        else:
            p, step = run_batch(x[i0 : i0 + nb], i0)
            ck["batches"][str(i0)] = {"preds": p.tolist(), "secs": step}
            save_checkpoint()
            print(f"[{time.time()-t0:6.1f}s] batch {i0 // nb}: {step:.1f}s "
                  f"({step / max(len(p), 1):.1f} s/image)", flush=True)
        all_preds.append(p)
        dt += step
    preds = np.concatenate(all_preds)[: args.images]
    per_img = dt / args.images
    n_timed = args.images

    agree = (preds == ptxt_preds).mean()
    acc = (preds == labels).mean()
    boots_rate = stats["total_bootstraps"] / per_img
    print(f"Inference Time: {dt:.2f} seconds for {n_timed} images "
          f"({per_img:.2f} s/image, {boots_rate:.0f} bootstraps/s)")
    print(f"encrypted preds: {preds.tolist()}")
    print(f"plaintext preds: {ptxt_preds.tolist()}")
    print(f"labels:          {labels.tolist()}")
    print(f"RESULT model={args.model} params={args.params} images={args.images} "
          f"s_per_image={per_img:.3f} bootstraps_per_s={boots_rate:.0f} "
          f"oracle_agreement={agree:.3f} accuracy={acc:.3f}"
          + (" timing=cold(compile-inclusive)" if cold else "")
          + (f" resumed_batches={n_resumed}" if n_resumed else ""))


if __name__ == "__main__":
    main()
