"""Weight-convert pipeline: byte-exact parity with the reference's
``make weight_convert`` build.

Goldens were produced by compiling the reference with -D_WEIGHT_CONVERT_ and
running it over synthetic float dumps (tests/golden/*_var_dat1.bin); parity
was also verified out-of-band for cifar/binarynet_small (884,983 bytes, the
shipped file's exact size).
"""

import os

import numpy as np
import pytest

from redsec_tpu.compiler.weight_convert import export_var_dat1, weight_convert
from redsec_tpu.models.spec import prep_model
from redsec_tpu.models.zoo import get_model

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name,stem", [
    ("mnist/sign1024x1", "sign1024x1"),
    ("mnist/relu1024x1", "relu1024x1"),
])
def test_weight_convert_byte_exact(name, stem):
    raw = os.path.join(GOLDEN, f"{stem}_var_dat1.bin")
    want = os.path.join(GOLDEN, f"{stem}_var_prep_from_ref_wght.dat")
    mine = weight_convert(get_model(name), raw)
    assert mine == open(want, "rb").read()


def test_converted_weights_load_and_run():
    """The converted blob preps and runs through the plaintext engine."""
    import jax.numpy as jnp

    from redsec_tpu.runtime.ptxt import build_forward

    blob = weight_convert(
        get_model("mnist/sign1024x1"),
        os.path.join(GOLDEN, "sign1024x1_var_dat1.bin"),
    )
    plan = prep_model(get_model("mnist/sign1024x1"), blob)
    x = np.zeros((1, 28, 28, 1), np.int32)
    logits = build_forward(plan)(jnp.asarray(x))
    assert logits.shape == (1, 10)


def test_export_var_dat1_roundtrip():
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=(3, 3, 1, 4)).astype(np.float32),
              rng.normal(size=4).astype(np.float32)]
    blob = export_var_dat1(arrays)
    back = np.frombuffer(blob, dtype="<f4")
    np.testing.assert_array_equal(back[: 36], arrays[0].reshape(-1))
    np.testing.assert_array_equal(back[36:], arrays[1])
