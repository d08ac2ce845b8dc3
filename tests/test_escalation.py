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
