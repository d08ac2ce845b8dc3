"""Netlist compiler, key/ciphertext formats, and CLI flow tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from redsec_tpu.compiler.netlist import (
    compile_netlist,
    parse_netlist,
    spec_from_json,
    spec_to_json,
)
from redsec_tpu.models.spec import Activation, ConvKind, Domain, PoolKind

from conftest import needs_reference, reference_path


@needs_reference
def test_parse_sample_netlist(tmp_path):
    spec = parse_netlist(reference_path("compiler/sample.csv"), "sample")
    assert len(spec.layers) == 5
    l0, l1, l4 = spec.layers[0], spec.layers[1], spec.layers[4]
    assert l0.domain == Domain.INT and l0.conv == ConvKind.NONE
    assert l0.pool == PoolKind.SUM and l0.activation == Activation.SIGN
    assert l1.domain == Domain.BIN and l1.conv == ConvKind.FC and l1.out_depth == 1024
    assert l1.conv_params.tern_thresh == 0.05
    assert l4.activation == Activation.NONE and l4.out_depth == 10
    assert spec.input_dims.h == 28 and spec.input_dims.up_bound == 510

    # JSON round trip
    spec2 = spec_from_json(json.loads(json.dumps(spec_to_json(spec))))
    assert spec2.layers == spec.layers and spec2.input_dims == spec.input_dims


@needs_reference
def test_compiled_sample_prep_matches_zoo(tmp_path):
    """The compiled sample netlist preps against the shipped sample weights
    exactly like the hand-built zoo model."""
    from redsec_tpu.models.spec import prep_model
    from redsec_tpu.models.zoo import get_model

    spec = parse_netlist(reference_path("compiler/sample.csv"), "sample")
    vp = reference_path("nets/sample/sample/var_prep.dat")
    if not os.path.exists(vp):
        pytest.skip("no sample var_prep.dat")
    plan_a = prep_model(spec, vp)
    plan_b = prep_model(get_model("sample/sample"), vp)
    for la, lb in zip(plan_a.layers, plan_b.layers):
        if la.conv is not None:
            np.testing.assert_array_equal(la.conv.weights, lb.conv.weights)
        np.testing.assert_array_equal(la.quant.bias, lb.quant.bias)
    assert plan_a.out_dim == plan_b.out_dim


@needs_reference
def test_compile_netlist_outputs(tmp_path):
    out = compile_netlist(reference_path("compiler/sample.csv"), "s", out_dir=str(tmp_path))
    assert os.path.exists(out["spec"]) and os.path.exists(out["train_script"])
    train = open(out["train_script"]).read()
    assert train.count("Flatten()") == 1
    assert "QuantDense(1024" in train and "SteTern" in train


def test_keys_roundtrip(tmp_path):
    from redsec_tpu.crypto import keygen as kg
    from redsec_tpu.crypto.params import TEST_NOISELESS
    from redsec_tpu.formats import keys as kio

    sk, cloud = kg.keygen(TEST_NOISELESS, seed=3)
    kio.save_secret_key(tmp_path / "s.npz", sk)
    kio.save_cloud_key(tmp_path / "e.npz", cloud)
    sk2 = kio.load_secret_key(str(tmp_path / "s.npz"))
    ck2 = kio.load_cloud_key(str(tmp_path / "e.npz"))
    np.testing.assert_array_equal(sk2.lwe_key, sk.lwe_key)
    np.testing.assert_array_equal(ck2.bk, cloud.bk)
    np.testing.assert_array_equal(ck2.ksk, cloud.ksk)
    assert sk2.params.name == "test_noiseless"

    ct = np.zeros((3, TEST_NOISELESS.n + 1), np.int32)
    kio.save_ciphertexts(tmp_path / "c.npz", ct, TEST_NOISELESS, label=7)
    ct2, params, label, _gain, _c = kio.load_ciphertexts(str(tmp_path / "c.npz"))
    assert label == 7 and params.name == "test_noiseless"
    np.testing.assert_array_equal(ct2, ct)


def test_prepared_key_cache_roundtrip(tmp_path):
    from redsec_tpu.crypto import bootstrap as bs, keygen as kg, lwe
    from redsec_tpu.crypto.params import TEST_NOISELESS
    from redsec_tpu.formats import keys as kio
    import jax.numpy as jnp

    sk, cloud = kg.keygen(TEST_NOISELESS, seed=5)
    dkey = bs.prepare_cloud_key(cloud)
    kio.save_prepared_key(tmp_path / "p.npz", dkey)
    dkey2 = kio.load_prepared_key(str(tmp_path / "p.npz"))
    ct = lwe.encrypt_integers(sk.lwe_key, np.array([100, -100]), TEST_NOISELESS,
                              np.random.default_rng(0))
    tv = bs.const_test_vector(TEST_NOISELESS, 1, TEST_NOISELESS.msg_space)
    a = np.asarray(bs.make_batched_bootstrap(dkey)(jnp.asarray(ct), jnp.asarray(tv)))
    b = np.asarray(bs.make_batched_bootstrap(dkey2)(jnp.asarray(ct), jnp.asarray(tv)))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_multichip_dryrun():
    """The driver's dryrun path: dp x tp mesh on 8 virtual CPU devices."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_netlist_wizard_reproduces_sample_structure(tmp_path):
    """build_netlist (the xlsm replacement's core) emits a CSV that the
    netlist compiler parses to the same ModelSpec as the reference's shipped
    sample.csv (compiler/sample.csv)."""
    import io

    from redsec_tpu.compiler.netlist import parse_netlist
    from redsec_tpu.compiler.wizard import WizardLayer, build_netlist, run_wizard

    layers = [
        WizardLayer("conv", 0, pool="sum", pool_window=(2, 2),
                    pool_stride=(2, 2), bnorm=False, activation="sign"),
        WizardLayer("fc", 1024), WizardLayer("fc", 1024),
        WizardLayer("fc", 1024),
        WizardLayer("fc", 10, bnorm=False, activation="none"),
    ]
    csv = build_netlist((28, 28, 1, 8), layers)
    p = tmp_path / "wiz.csv"
    p.write_text(csv)
    got = parse_netlist(str(p), "wiz")
    ref = parse_netlist(reference_path("compiler", "sample.csv"), "wiz")
    assert len(got.layers) == len(ref.layers)
    for a, b in zip(got.layers, ref.layers):
        assert (a.domain, a.conv, a.out_depth, a.pool, a.activation, a.bias) \
            == (b.domain, b.conv, b.out_depth, b.pool, b.activation, b.bias)

    # the interactive flow with default answers produces a valid netlist too
    answers = io.StringIO("\n".join([""] * 40))
    csv2 = run_wizard(answers, io.StringIO())
    p2 = tmp_path / "wiz2.csv"
    p2.write_text(csv2)
    spec2 = parse_netlist(str(p2), "wiz2")
    assert spec2.layers[-1].out_depth == 10


def test_netlist_wizard_enforces_style_guide():
    import pytest

    from redsec_tpu.compiler.wizard import WizardLayer, build_netlist

    with pytest.raises(ValueError, match="MaxPool requires Sign"):
        build_netlist((28, 28, 1, 8), [
            WizardLayer("fc", 64, pool="max", activation="relu"),
            WizardLayer("fc", 10, bnorm=False, activation="none"),
        ])
    with pytest.raises(ValueError, match="BNorm not allowed"):
        build_netlist((28, 28, 1, 8), [
            WizardLayer("fc", 10, bnorm=True, activation="none"),
        ])
