"""Per-batch checkpoint/resume of the encrypted runner (VERDICT r3 #5).

Multi-hour staged CIFAR runs die to session timeouts; the runner persists
each batch's decrypted results after the batch completes, and a resumed
session must (a) skip completed batches and (b) produce BIT-IDENTICAL
results to an uninterrupted run (encryption randomness is derived from the
batch's first image index, not from how many batches ran before it).

The test drives scripts/run_encrypted_mnist.py through its real command
surface against a synthetic reference directory: a generated
mnist/sign1024x1 var_prep.dat (the real 196->1024->10 geometry) with
near-gray pixels so the tiny noiseless parameter set's 1024-slot message
space holds every boundary.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_reference(tmp_path, rng):
    """Synthetic /root/reference layout for mnist/sign1024x1: packed weights
    (format of lib/BinOps.cpp:289-333) + a 4-row mnist_data.csv."""
    from redsec_tpu.formats.varprep import VarPrepWriter

    net = tmp_path / "nets" / "mnist" / "sign1024x1"
    net.mkdir(parents=True)
    wr = VarPrepWriter()
    wr.write_i32(np.array([0]))  # layer 0 pool/sign bias
    wr.write_tern(rng.choice([-1, 0, 1], size=196 * 1024, p=[0.2, 0.6, 0.2]))
    wr.write_i32(rng.integers(-8, 9, size=1024))
    wr.write_tern(rng.choice([-1, 0, 1], size=1024 * 10, p=[0.2, 0.6, 0.2]))
    wr.write_i32(rng.integers(-8, 9, size=10))
    (net / "var_prep.dat").write_bytes(wr.getvalue())

    rows = []
    for i in range(4):
        px = rng.integers(120, 136, size=28 * 28)  # 2p-255 in [-15, 17]
        rows.append(f"{i % 10}," + ",".join(str(v) for v in px))
    (tmp_path / "nets" / "mnist" / "mnist_data.csv").write_text(
        "\n".join(rows) + "\n")
    return tmp_path


def _run(tmp_path, ck):
    # REDSEC_MAX_FLIP=1: random synthetic weights have near-zero margins,
    # and this test's contract is resume determinism, not agreement
    env = dict(os.environ, PYTHONPATH=REPO, REDSEC_DEVICE="cpu",
               JAX_PLATFORMS="cpu", REDSEC_ROUND_KERNEL="0",
               REDSEC_MAX_FLIP="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run_encrypted_mnist.py"),
         "--images", "4", "--batch", "2", "--model", "mnist/sign1024x1",
         "--params", "test_noiseless", "--reference", str(tmp_path),
         "--checkpoint", str(ck)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


@pytest.mark.slow
def test_runner_resume_bit_identical(tmp_path):
    rng = np.random.default_rng(7)
    _make_reference(tmp_path, rng)
    ck = tmp_path / "run.ckpt.json"

    out1 = _run(tmp_path, ck)
    res1 = [l for l in out1.splitlines() if l.startswith("RESULT")][0]
    state = json.loads(ck.read_text())
    assert sorted(state["batches"]) == ["0", "2"]

    # simulate a session killed after batch 0: drop batch 2 and resume
    full = {k: v["preds"] for k, v in state["batches"].items()}
    del state["batches"]["2"]
    ck.write_text(json.dumps(state))
    out2 = _run(tmp_path, ck)
    assert "resuming: 1 batch(es) already done [0]" in out2
    res2 = [l for l in out2.splitlines() if l.startswith("RESULT")][0]

    state2 = json.loads(ck.read_text())
    assert {k: v["preds"] for k, v in state2["batches"].items()} == full
    keep = ("oracle_", "accuracy")  # timing fields legitimately differ
    assert [f for f in res1.split() if f.startswith(keep)] \
        == [f for f in res2.split() if f.startswith(keep)]
    assert "resumed_batches=1" in res2

    # a different configuration must refuse the stale checkpoint
    env = dict(os.environ, PYTHONPATH=REPO, REDSEC_DEVICE="cpu",
               JAX_PLATFORMS="cpu", REDSEC_MAX_FLIP="1",
               REDSEC_INPUT_GAIN="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run_encrypted_mnist.py"),
         "--images", "4", "--batch", "2", "--model", "mnist/sign1024x1",
         "--params", "test_noiseless", "--reference", str(tmp_path),
         "--checkpoint", str(ck)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=600)
    assert r.returncode != 0
    assert "different configuration" in (r.stderr + r.stdout)


@pytest.mark.slow
def test_checkpoint_extension_and_eval_offset(tmp_path):
    """(a) A checkpoint written at images=2 extends to images=4 (batch RNG
    is seeded by absolute row index, so the first batch is reusable
    verbatim); (b) an --eval-offset 2 run reproduces exactly the rows-2:4
    batch of the offset-0 run (same absolute seeds)."""
    rng = np.random.default_rng(11)
    _make_reference(tmp_path, rng)
    ck = tmp_path / "ext.ckpt.json"
    env = dict(os.environ, PYTHONPATH=REPO, REDSEC_DEVICE="cpu",
               JAX_PLATFORMS="cpu", REDSEC_ROUND_KERNEL="0",
               REDSEC_MAX_FLIP="1")

    def run(*extra):
        r = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts/run_encrypted_mnist.py"),
             "--batch", "2", "--model", "mnist/sign1024x1",
             "--params", "test_noiseless", "--reference", str(tmp_path),
             *extra],
            capture_output=True, text=True, cwd=str(tmp_path), env=env,
            timeout=600)
        assert r.returncode == 0, r.stderr[-3000:]
        return r.stdout

    run("--images", "2", "--checkpoint", str(ck))
    state = json.loads(ck.read_text())
    assert sorted(state["batches"]) == ["0"]

    out = run("--images", "4", "--checkpoint", str(ck))
    assert "extended 2 -> 4 images" in out
    state = json.loads(ck.read_text())
    assert sorted(state["batches"]) == ["0", "2"]

    out_ofs = run("--images", "2", "--eval-offset", "2")
    pr = [l for l in out_ofs.splitlines()
          if l.startswith("encrypted preds")][0]
    assert pr.split(":")[1].strip() == str(state["batches"]["2"]["preds"])
    assert "eval_offset=2" in out_ofs
