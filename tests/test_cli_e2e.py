"""CLI end-to-end flow (structure/IO): keygen -> encrypt -> run -> decrypt.

Uses the tiny noiseless parameter set and a compiled BYON spec so the whole
client/cloud file pipeline is exercised through the real command surface.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from redsec_tpu.compiler.netlist import spec_to_json
from redsec_tpu.formats.varprep import VarPrepWriter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO, REDSEC_DEVICE="cpu",
               REDSEC_ROUND_KERNEL="0")
    r = subprocess.run([sys.executable, "-m", "redsec_tpu", *args],
                       capture_output=True, text=True, cwd=cwd, env=env,
                       timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


@pytest.mark.slow
def test_cli_full_flow(tmp_path):
    from test_encrypted_ops import make_mini_sign_net

    rng = np.random.default_rng(0)
    spec, blob = make_mini_sign_net(rng)
    (tmp_path / "weights.dat").write_bytes(blob)
    with open(tmp_path / "mini_spec.json", "w") as f:
        json.dump(spec_to_json(spec), f)
    # 8x8 image csv row (label + 64 pixels)
    px = rng.integers(100, 140, size=64)
    with open(tmp_path / "data.csv", "w") as f:
        f.write("3," + ",".join(str(v) for v in px) + "\n")

    out = run_cli("keygen", "--params", "test_noiseless", "--out-dir", ".",
                  cwd=tmp_path)
    assert "keyset" in out

    # encrypt via image.ptxt path (arbitrary image geometry)
    from redsec_tpu.formats.image_io import write_image_ptxt

    write_image_ptxt(str(tmp_path / "img.ptxt"), 3,
                     rng.integers(110, 135, size=(8, 8, 1)))
    out = run_cli("encrypt-image", "--secret", "secret.key.npz",
                  "--image-ptxt", "img.ptxt", "--out", "image.ctxt.npz",
                  cwd=tmp_path)
    assert "encrypted 1 image" in out

    out = run_cli("run-encrypted", "--model", "mini_spec.json",
                  "--weights", "weights.dat", "--eval", "eval.key.npz",
                  "--image", "image.ctxt.npz", "--out", "out.ctxt.npz",
                  cwd=tmp_path)
    assert "Inference Time" in out

    out = run_cli("decrypt-image", "--secret", "secret.key.npz",
                  "--output", "out.ctxt.npz", cwd=tmp_path)
    assert "Classification Result:" in out
