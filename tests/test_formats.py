"""Tests for the byte-compatible var_prep.dat reader/writer."""

import numpy as np
import pytest

from redsec_tpu.formats.varprep import VarPrepReader, VarPrepWriter

from conftest import needs_reference, reference_path


def test_tern_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.choice([-1, 0, 1], size=4096).astype(np.int8)
    wr = VarPrepWriter()
    wr.write_tern(w)
    rd = VarPrepReader(wr.getvalue())
    np.testing.assert_array_equal(rd.read_tern(len(w)), w)
    assert rd.at_eof()


def test_tern_packing_layout():
    # weights [+1, 0, -1, +1] -> bits (sign,tern): (1,0)(x,1)(0,0)(1,0)
    # MSB-first byte: 1 0 | s 1 | 0 0 | 1 0 ; our writer uses s=0 for zeros.
    wr = VarPrepWriter()
    wr.write_tern(np.array([1, 0, -1, 1], dtype=np.int8))
    data = wr.getvalue()
    assert data[0] == 2  # TERN_FMT
    assert data[1] == 0b10010010


def test_i32_roundtrip():
    vals = np.array([-5, 0, 7, 123456, -2**31], dtype=np.int64)
    wr = VarPrepWriter()
    wr.write_i32(vals)
    rd = VarPrepReader(wr.getvalue())
    np.testing.assert_array_equal(rd.read_i32(len(vals)), vals.astype(np.int32))


def test_i32_float_floor():
    # the reference floors float biases before casting (lib/BinOps.cpp:434-437)
    wr = VarPrepWriter()
    wr.write_i32(np.array([1.75, -0.25, -1.5]))
    rd = VarPrepReader(wr.getvalue())
    np.testing.assert_array_equal(rd.read_i32(3), [1, -1, -2])


@needs_reference
def test_reference_sign1024x1_sections():
    """Walk the shipped var_prep.dat exactly (layout verified in SURVEY.md §2.5)."""
    rd = VarPrepReader(reference_path("nets/mnist/sign1024x1/var_prep.dat"))
    b0 = rd.read_i32(1)  # first-layer quantize bias
    w1 = rd.read_tern(196 * 1024)
    b1 = rd.read_i32(1024)
    w2 = rd.read_tern(1024 * 10)
    b2 = rd.read_i32(10)
    assert rd.at_eof()
    assert set(np.unique(w1)) <= {-1, 0, 1}
    assert (w1 == 0).mean() > 0.001  # ternary weights present at thresh=0.05
    assert abs(int(b0[0])) < 10**6 and len(b2) == 10


@needs_reference
def test_reference_relu_slope_sections():
    """relu1024x1: bias(1) / [tern 196*1024, bias 1024, slope 1024] / [tern 1024*10, bias 10]."""
    rd = VarPrepReader(reference_path("nets/mnist/relu1024x1/var_prep.dat"))
    rd.read_i32(1)
    rd.read_tern(196 * 1024)
    rd.read_i32(1024)
    slope = rd.read_u32(1024)
    rd.read_tern(1024 * 10)
    rd.read_i32(10)
    assert rd.at_eof()
    assert (slope > 0).all()


def test_imagenet_client_geometry(tmp_path):
    """ImageNet 224x224x3 client surface (client/image_converter.py:10-21,
    1000-class decrypt at decrypt_image.cpp:50-59): CSV load, image.ptxt
    roundtrip, and pixel conversion at the full geometry."""
    import numpy as np

    from redsec_tpu.formats import image_io

    assert image_io.image_shape_for("imagenet") == (224, 224, 3)
    assert image_io.shape_for_model("imagenet/resnet_bnn") == (224, 224, 3)
    assert image_io.shape_for_model("mnist/sign1024x1") == (28, 28, 1)
    assert image_io.shape_for_model("cifar/binarynet") == (32, 32, 3)

    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, size=(224, 224, 3), dtype=np.int32)
    csv = tmp_path / "imagenet_row.csv"
    csv.write_text("7," + ",".join(str(int(v)) for v in px.reshape(-1)) + "\n")
    labels, imgs = image_io.load_csv_dataset(str(csv), 224, 224, 3)
    assert labels.tolist() == [7] and imgs.shape == (1, 224, 224, 3)
    np.testing.assert_array_equal(imgs[0], px)

    p = tmp_path / "image.ptxt"
    image_io.write_image_ptxt(str(p), 7, px)
    label, back = image_io.read_image_ptxt(str(p))
    assert label == 7
    np.testing.assert_array_equal(back, px)
    signed = image_io.pixels_to_signed(imgs)
    assert signed.min() >= -255 and signed.max() <= 255
