"""Per-boundary parameter escalation (REDSEC_ESCALATE).

Routes chosen layers' sign-type PBS boundaries through a SECOND cloud key
at a bigger-N geometry (halved mod-switch sigma) while the bulk layers stay
on the fast key.  Cryptographic basis: same-seed keygen draws the client
LWE key FIRST, so two parameter sets with equal n share the secret key and
their bootstraps' ciphertexts are interchangeable.  No reference analogue —
its parameter set is fixed per build (client/gen_secure_keyset.cpp:94-97).
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto.params import TEST_NOISELESS, get_params
from redsec_tpu.models.spec import prep_model
from redsec_tpu.runtime import ranges as rr
from redsec_tpu.runtime.encrypted import (
    build_encrypted_forward,
    decrypt_scores,
    encrypt_images,
    escalation_config,
    model_in_gain,
)

from test_encrypted_ops import make_mini_sign_net

TEST_NOISELESS_N512 = dataclasses.replace(
    TEST_NOISELESS, name="test_noiseless_n512", N=512)


@pytest.fixture(scope="module")
def two_keys():
    sk, cloud = kg.keygen(TEST_NOISELESS, seed=17)
    sk2, cloud2 = kg.keygen(TEST_NOISELESS_N512, seed=17)
    # the escalation contract: same-seed keygen shares the client LWE key
    np.testing.assert_array_equal(sk.lwe_key, sk2.lwe_key)
    return sk, bs.prepare_cloud_key(cloud), bs.prepare_cloud_key(cloud2)


def test_shared_lwe_key_across_production_sets():
    """small_v2_tpu and small_v2_n2048 draw the identical n=350 client key
    under the same seed (both sample it first from the same rng)."""
    rng_a = np.random.default_rng(0)
    rng_b = np.random.default_rng(0)
    ka = kg.lwe_key_gen(rng_a, get_params("small_v2_tpu").n)
    kb = kg.lwe_key_gen(rng_b, get_params("small_v2_n2048").n)
    np.testing.assert_array_equal(ka, kb)


def test_escalated_staged_forward_matches_plain(two_keys, monkeypatch):
    """Escalating the mini net's boundaries through the N=512 key decodes
    identically to the all-small-key forward on noiseless keys (exact
    arithmetic at both geometries) — including one escalated boundary that
    also majority-votes (plan + escalation compose)."""
    sk, dkey, dkey2 = two_keys
    params = TEST_NOISELESS
    rng = np.random.default_rng(2)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(2, 8, 8, 1)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    monkeypatch.setenv("REDSEC_INPUT_GAIN", "1")
    info = rr.resolve_pbs_ranges(plan, params.msg_space, input_gain=True,
                                 sigma_units=params.mod_switch_sigma_units(),
                                 strict=False)
    ct = jnp.asarray(encrypt_images(sk, x, params, np.random.default_rng(8),
                                    gain=model_in_gain(info)))

    fwd = build_encrypted_forward(plan, dkey, jit="staged", range_check=False)
    plain = decrypt_scores(sk, np.asarray(fwd(ct)), params, fwd.out_gain)

    fwd_esc = build_encrypted_forward(plan, dkey, jit="staged",
                                      range_check=False,
                                      escalate=({0}, dkey2))
    esc = decrypt_scores(sk, np.asarray(fwd_esc(ct)), params, fwd_esc.out_gain)
    np.testing.assert_array_equal(esc, plain)

    monkeypatch.setenv("REDSEC_MAJORITY_PLAN", "0:3")
    fwd_both = build_encrypted_forward(plan, dkey, jit="staged",
                                       range_check=False,
                                       escalate=({0}, dkey2))
    both = decrypt_scores(sk, np.asarray(fwd_both(ct)), params,
                          fwd_both.out_gain)
    np.testing.assert_array_equal(both, plain)


def test_escalated_relu_staged_closer_to_oracle(two_keys):
    """Relu boundaries (quarter or FDFB) escalate too: the staircase test
    vector rebuilds at the big-N geometry.  The escalated key reads a 2x
    finer rotation grid with half the mask mod-switch rounding (the only
    noise source on these alpha=0 keys), so with everything else identical
    its decoded scores must sit strictly closer to the plaintext oracle
    than the plain run's (the same relationship the production sets have:
    msize 4096 over 2N=2048 plain vs 2N=4096 escalated).  Deterministic:
    fixed seeds fix both mask realizations."""
    from redsec_tpu.formats.varprep import VarPrepWriter
    from redsec_tpu.models.dims import Dimensions
    from redsec_tpu.models.spec import (
        Activation as A, BiasKind, ConvKind, ConvParams, Domain, LayerSpec,
        ModelSpec, PoolKind,
    )

    sk, dkey, dkey2 = two_keys
    params = TEST_NOISELESS
    rng = np.random.default_rng(4)
    spec = ModelSpec(
        "test/relu_escalated",
        Dimensions(h=1, w=1, in_dep=16, in_bits=3, up_bound=4, scale=1.0),
        [
            LayerSpec(Domain.INT, ConvKind.FC, 8, PoolKind.NONE, A.RELU,
                      BiasKind.BNORM, conv_params=ConvParams(tern_thresh=0.1),
                      shift_bits=3),
            LayerSpec(Domain.INT, ConvKind.FC, 3, PoolKind.NONE, A.NONE,
                      BiasKind.NONE),
        ],
    )
    wr = VarPrepWriter()
    wr.write_tern(rng.choice([-1, 0, 1], size=16 * 8))
    wr.write_i32(rng.integers(-64, 64, size=8))
    wr.write_i32(np.full(8, 16), signed=False)
    wr.write_tern(rng.choice([-1, 0, 1], size=8 * 3))
    wr.write_i32(rng.integers(-4, 5, size=3))
    plan = prep_model(spec, wr.getvalue())
    x = rng.integers(-1, 2, size=(2, 1, 1, 16)).astype(np.int32)
    ct = jnp.asarray(encrypt_images(sk, x, params, rng))
    from redsec_tpu.runtime.ptxt import build_forward

    oracle = np.asarray(build_forward(plan)(jnp.asarray(x)))
    fwd = build_encrypted_forward(plan, dkey, jit="staged")
    plain = decrypt_scores(sk, np.asarray(fwd(ct)), params, fwd.out_gain)
    fwd_esc = build_encrypted_forward(plan, dkey, jit="staged",
                                      escalate=({0}, dkey2))
    got = decrypt_scores(sk, np.asarray(fwd_esc(ct)), params,
                         fwd_esc.out_gain)
    dev_esc = np.abs(got - oracle).sum()
    dev_plain = np.abs(plain - oracle).sum()
    assert dev_esc < dev_plain, (got, plain, oracle)
    # and the escalated staircase lands within one step everywhere
    assert np.abs(got - oracle).max() <= 1, (got, oracle)


def test_escalation_forces_staged(two_keys):
    sk, dkey, dkey2 = two_keys
    rng = np.random.default_rng(2)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(1, 8, 8, 1)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    fwd = build_encrypted_forward(plan, dkey, jit=True, range_check=False,
                                  escalate=({0}, dkey2))
    assert fwd.mode == "staged"


def test_escalation_rejects_mismatched_message_space(two_keys):
    sk, dkey, _ = two_keys
    _, cloud_bad = kg.keygen(
        dataclasses.replace(TEST_NOISELESS_N512, msg_space=2048), seed=17)
    dkey_bad = bs.prepare_cloud_key(cloud_bad)
    rng = np.random.default_rng(2)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(1, 8, 8, 1)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    with pytest.raises(ValueError, match="message space"):
        build_encrypted_forward(plan, dkey, jit="staged", range_check=False,
                                escalate=({0}, dkey_bad))


def test_escalation_config_env(monkeypatch):
    monkeypatch.setenv("REDSEC_ESCALATE", "6, 7")
    monkeypatch.setenv("REDSEC_ESCALATE_PARAMS", "small_v2_n2048")
    layers, name = escalation_config()
    assert layers == {6, 7} and name == "small_v2_n2048"
