"""Plaintext-engine parity tests against the reference ``make ptxt`` oracle.

Golden files in tests/golden/ were produced by compiling the reference's
plaintext build (sequentially, since its OpenMP regions read uninitialized
private variables) and running it over the first 100 rows of the shipped
dataset CSVs.  They contain per-image per-class scores, so the comparison is
bit-exact on the final-layer logits, not just on accuracy.
"""

import os
import re

import numpy as np
import pytest

from redsec_tpu.formats.image_io import (
    load_csv_dataset,
    pixel_transform_for,
)
from redsec_tpu.models.spec import prep_model
from redsec_tpu.models.zoo import get_model
from redsec_tpu.runtime.ptxt import build_forward

from conftest import needs_reference, reference_path

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def parse_golden_logits(path):
    """Parse ``Category i: v`` lines -> [n_images, 10] int array."""
    scores = []
    with open(path) as f:
        for line in f:
            m = re.match(r"Category (\d+): (-?\d+)", line)
            if m:
                scores.append(int(m.group(2)))
    arr = np.array(scores, dtype=np.int64).reshape(-1, 10)
    if arr.shape[0] == 0:
        pytest.skip("golden file has no per-class scores captured")
    return arr


def run_model_logits(name, csv_path, h, w, c, limit=100):
    spec = get_model(name)
    vp = reference_path("nets", name, "var_prep.dat")
    plan = prep_model(spec, vp)
    labels, px = load_csv_dataset(csv_path, h, w, c, limit=limit)
    x = pixel_transform_for(name)(px)
    import jax.numpy as jnp

    logits = np.asarray(build_forward(plan)(jnp.asarray(x)))
    return labels, logits


@needs_reference
def test_sign1024x1_logits_bit_exact():
    golden = parse_golden_logits(os.path.join(GOLDEN_DIR, "sign1024x1_ptxt_golden.txt"))
    labels, logits = run_model_logits(
        "mnist/sign1024x1", reference_path("nets/mnist/mnist_data.csv"), 28, 28, 1
    )
    assert golden.shape[0] == logits.shape[0] == 100
    np.testing.assert_array_equal(logits, golden)
    acc = (logits.argmax(1) == labels).mean()
    assert acc == pytest.approx(0.96)  # reference prints "Correct: 96.000000%"


@needs_reference
@pytest.mark.parametrize(
    "name",
    ["mnist/relu1024x1", "mnist/relu1024x2", "mnist/relu1024x3",
     "mnist/sign1024x2", "mnist/sign1024x3"],
)
def test_mnist_logits_bit_exact(name):
    gpath = os.path.join(GOLDEN_DIR, f"{name.replace('/', '_')}_ptxt_golden.txt")
    if not os.path.exists(gpath):
        pytest.skip("golden not captured")
    golden = parse_golden_logits(gpath)
    labels, logits = run_model_logits(
        name, reference_path("nets/mnist/mnist_data.csv"), 28, 28, 1, limit=golden.shape[0]
    )
    np.testing.assert_array_equal(logits, golden)


@needs_reference
def test_sample_net_logits_bit_exact():
    """The compiler's sample.csv net (nets/sample/sample/net.cpp:112-144),
    run over the 100-row MNIST set with its shipped (untrained) weights."""
    gpath = os.path.join(GOLDEN_DIR, "sample_sample_ptxt_golden.txt")
    golden = parse_golden_logits(gpath)
    labels, logits = run_model_logits(
        "sample/sample", reference_path("nets/mnist/mnist_data.csv"), 28, 28, 1,
        limit=golden.shape[0]
    )
    np.testing.assert_array_equal(logits, golden)


@needs_reference
@pytest.mark.slow  # ~2 min of CPU conv per net; the MNIST goldens cover the
# same layer code per-commit (tier re-binning, VERDICT r2 #10)
@pytest.mark.parametrize("name", ["cifar/binarynet_small", "cifar/binarynet"])
def test_cifar_logits_bit_exact(name):
    gpath = os.path.join(GOLDEN_DIR, f"{name.replace('/', '_')}_ptxt_golden.txt")
    if not os.path.exists(gpath):
        pytest.skip("golden not captured")
    # first 16 images keep the CPU conv time reasonable; parity is bit-exact
    golden = parse_golden_logits(gpath)[:16]
    labels, logits = run_model_logits(
        name, reference_path("nets/cifar/cifar_data.csv"), 32, 32, 3, limit=golden.shape[0]
    )
    np.testing.assert_array_equal(logits, golden)
