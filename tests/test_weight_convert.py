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


def synthetic_var_dat1(spec, seed=42) -> bytes:
    """Deterministic float dump in the reader-implied order (filters; BIAS
    floats; BNORM beta/mean/variance) — regenerates the exact input the
    reference's -D_WEIGHT_CONVERT_ build consumed to produce the committed
    golden (so the 14 MB raw blob need not live in the repo)."""
    from redsec_tpu.models.spec import BiasKind, ConvKind, PoolKind

    rng = np.random.default_rng(seed)
    out = []
    dim_h, dim_w, dep = spec.input_dims.h, spec.input_dims.w, spec.input_dims.in_dep
    for l in spec.layers:
        if l.conv != ConvKind.NONE:
            if l.conv in (ConvKind.FC, ConvKind.FC_FINAL):
                dep, dim_h, dim_w, win = dep * dim_h * dim_w, 1, 1, (1, 1)
            else:
                win = l.conv_params.window
            out.append(rng.normal(0, 0.5, win[0] * win[1] * dep * l.out_depth)
                       .astype("<f4"))
            if l.bias == BiasKind.BIAS:
                out.append(rng.normal(0, 1, l.out_depth).astype("<f4"))
            dep = l.out_depth
            if l.conv == ConvKind.CONV and not l.conv_params.same_pad:
                dim_h -= win[0] - 1
                dim_w -= win[1] - 1
        if l.bias == BiasKind.BNORM:
            out.append(rng.normal(0, 1, dep).astype("<f4"))  # beta
            out.append(rng.normal(0, 1, dep).astype("<f4"))  # mean
            out.append((np.abs(rng.normal(0, 1, dep)) + 0.3).astype("<f4"))
        if l.pool == PoolKind.SUM or (
            l.pool == PoolKind.MAX and l.conv != ConvKind.FC_FINAL
        ):
            w = l.pool_params.window
            dim_h //= w[0]
            dim_w //= w[1]
    return b"".join(a.tobytes() for a in out)


def test_weight_convert_conv_bnorm_net_byte_exact():
    """BatchNorm folding on CONVOLUTION layers (lib/BinFunc.cpp:552-592,
    IntFunc.cpp:404-557) against the reference -D_WEIGHT_CONVERT_ build run
    over a synthetic cifar/binarynet_small var.dat1 (VERDICT r1 item 7).
    The golden is exactly the shipped var_prep.dat's size (884,983 B)."""
    import gzip

    from redsec_tpu.models.zoo import get_model

    spec = get_model("cifar/binarynet_small")
    raw = synthetic_var_dat1(spec)
    assert len(raw) == 14058752  # the reader-implied float count
    mine = weight_convert(spec, raw)
    want = gzip.open(
        os.path.join(GOLDEN, "cifar_binarynet_small_var_prep_from_ref_wght.dat.gz"),
        "rb").read()
    assert len(want) == 884983
    assert mine == want


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
