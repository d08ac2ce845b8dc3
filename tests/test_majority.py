"""Re-randomized majority-voted PBS (ops/encrypted.py:majority_pbs).

The round-3 accuracy mechanism for sub-noise sign margins: k ciphertext
copies re-randomized from the CloudKey.rerand zero-encryption pool vote a
sign decision, collapsing the per-boundary mod-switch flip rate p to
~P(Binom(k, p) > k/2).  No reference analogue (the reference bootstraps each
decision once, lib/BinOps_enc.cpp:182-186).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto.params import TEST_NOISELESS, get_params
from redsec_tpu.models.spec import prep_model
from redsec_tpu.ops import encrypted as eops
from redsec_tpu.runtime import ranges as rr
from redsec_tpu.runtime.encrypted import (
    build_encrypted_forward,
    build_forward_impl,
    decrypt_scores,
    encrypt_images,
    model_in_gain,
    model_out_gain,
)
from redsec_tpu.runtime.ptxt import build_forward

from test_encrypted_ops import make_mini_sign_net


@pytest.fixture(scope="module")
def keys():
    sk, cloud = kg.keygen(TEST_NOISELESS, seed=17)
    assert cloud.rerand is not None and cloud.rerand.shape == (
        kg.RERAND_POOL, TEST_NOISELESS.n + 1)
    return sk, cloud, bs.prepare_cloud_key(cloud)


def test_rerand_pool_encrypts_zero(keys):
    sk, cloud, _ = keys
    dec = lwe.decrypt_integers(sk.lwe_key, cloud.rerand, TEST_NOISELESS)
    np.testing.assert_array_equal(dec, 0)


def test_rerand_changes_mask_not_message(keys):
    """ct + pool[i] decrypts identically but has a different mask — the
    decorrelation primitive behind the vote copies."""
    sk, cloud, _ = keys
    rng = np.random.default_rng(0)
    vals = rng.integers(-500, 500, size=8)
    ct = lwe.encrypt_integers(sk.lwe_key, vals, TEST_NOISELESS, rng)
    ct2 = ct + cloud.rerand[3][None]
    np.testing.assert_array_equal(
        lwe.decrypt_integers(sk.lwe_key, ct2, TEST_NOISELESS), vals)
    assert not np.array_equal(ct2[:, :-1], ct[:, :-1])


def test_majority_pbs_noiseless_matches_plain(keys):
    """With noiseless keys the voted boundary must agree with the plain
    bootstrap bit-for-bit at the decrypt level (all votes identical)."""
    sk, _, dkey = keys
    params = TEST_NOISELESS
    rng = np.random.default_rng(5)
    vals = rng.integers(-500, 500, size=32)
    ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, params, rng))
    tv = jnp.asarray(bs.const_test_vector(params, 7, params.msg_space))
    pbs = bs.make_batched_bootstrap(dkey)
    want = lwe.decrypt_integers(sk.lwe_key, np.asarray(pbs(ct, tv)), params)
    got = lwe.decrypt_integers(
        sk.lwe_key,
        np.asarray(eops.majority_pbs(pbs, ct, tv, params, 3, dkey.rerand,
                                     salt=4)),
        params)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(want, np.where(vals >= 0, 7, -7))


def test_majority_rejects_even_k(monkeypatch):
    from redsec_tpu.runtime.encrypted import majority_config

    monkeypatch.setenv("REDSEC_MAJORITY", "2")
    with pytest.raises(ValueError, match="odd"):
        majority_config()


def test_majority_forward_noiseless_end_to_end(keys, monkeypatch):
    """Whole-jit encrypted forward with REDSEC_MAJORITY=3 over the mini sign
    net: decoded scores must match both the plain encrypted forward and the
    plaintext oracle.

    NOTE even with noiseless keys a re-randomized copy's MOD-SWITCH rounding
    differs (that is the whole mechanism), so unanimity needs margins beyond
    the rounding spread — the flip-optimal gains provide exactly that (and
    the run is seed-deterministic either way)."""
    sk, _, dkey = keys
    params = TEST_NOISELESS
    rng = np.random.default_rng(2)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(4, 8, 8, 1)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    info = rr.resolve_pbs_ranges(plan, params.msg_space, input_gain=True,
                                 sigma_units=params.mod_switch_sigma_units(),
                                 strict=False)

    want = np.asarray(build_forward(plan)(jnp.asarray(x)))
    ct = jnp.asarray(encrypt_images(sk, x, params, np.random.default_rng(8),
                                    gain=model_in_gain(info)))

    def run():
        from redsec_tpu.runtime.encrypted import model_out_center

        impl = build_forward_impl(plan, dkey.params, dkey.plan, info=info,
                                  rerand=dkey.rerand)
        out = impl(dkey.bk_ntt, dkey.ksk_limbs, ct)
        return decrypt_scores(sk, np.asarray(out), params,
                              model_out_gain(info), model_out_center(info))

    plain = run()
    monkeypatch.setenv("REDSEC_MAJORITY", "3")
    voted = run()
    np.testing.assert_array_equal(voted, plain)
    np.testing.assert_array_equal(voted.argmax(1), want.argmax(1))

    # staged runtime takes the same voted path (two pbs_host dispatches);
    # its internal resolve must reproduce the test's info (input gain via
    # env, strict off: the mini net's margins trip the flip guard by design)
    monkeypatch.setenv("REDSEC_MAJORITY_FROM", "1")
    monkeypatch.setenv("REDSEC_INPUT_GAIN", "1")
    fwd = build_encrypted_forward(plan, dkey, jit="staged", range_check=False)
    staged = decrypt_scores(sk, np.asarray(fwd(ct)), params, fwd.out_gain)
    np.testing.assert_array_equal(staged, plain)


def test_majority_missing_pool_raises(keys, monkeypatch):
    sk, _, dkey = keys
    import dataclasses

    dkey_nopool = dataclasses.replace(dkey, rerand=None)
    monkeypatch.setenv("REDSEC_MAJORITY", "3")
    rng = np.random.default_rng(2)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(2, 8, 8, 1)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    with pytest.raises(ValueError, match="re-randomization"):
        fwd = build_encrypted_forward(plan, dkey_nopool, jit=False,
                                      range_check=False)
        fwd(jnp.zeros((1, 8, 8, 1, TEST_NOISELESS.n + 1), jnp.int32))


def test_majority_plan_resolution(monkeypatch):
    """REDSEC_MAJORITY_PLAN overrides the global k per layer index."""
    from redsec_tpu.runtime.encrypted import majority_k_for_layer

    monkeypatch.setenv("REDSEC_MAJORITY", "3")
    monkeypatch.setenv("REDSEC_MAJORITY_FROM", "1")
    monkeypatch.setenv("REDSEC_MAJORITY_PLAN", "0:5, 2:1")
    assert majority_k_for_layer(0) == 5   # plan overrides FROM-gate
    assert majority_k_for_layer(1) == 3   # global
    assert majority_k_for_layer(2) == 1   # plan disables
    monkeypatch.setenv("REDSEC_MAJORITY_PLAN", "1:4")
    with pytest.raises(ValueError, match="odd"):
        majority_k_for_layer(1)


def test_majority_plan_staged_forward(keys, monkeypatch):
    """Staged forward with a mixed per-layer plan (k=3 on layer 0 only)
    decodes identically to the plain forward on noiseless keys."""
    sk, _, dkey = keys
    params = TEST_NOISELESS
    rng = np.random.default_rng(2)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(2, 8, 8, 1)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    monkeypatch.setenv("REDSEC_INPUT_GAIN", "1")
    fwd = build_encrypted_forward(plan, dkey, jit="staged", range_check=False)
    info = rr.resolve_pbs_ranges(plan, params.msg_space, input_gain=True,
                                 sigma_units=params.mod_switch_sigma_units(),
                                 strict=False)
    ct = jnp.asarray(encrypt_images(sk, x, params, np.random.default_rng(8),
                                    gain=model_in_gain(info)))
    plain = decrypt_scores(sk, np.asarray(fwd(ct)), params, fwd.out_gain)
    monkeypatch.setenv("REDSEC_MAJORITY_PLAN", "0:3")
    fwd2 = build_encrypted_forward(plan, dkey, jit="staged", range_check=False)
    voted = decrypt_scores(sk, np.asarray(fwd2(ct)), params, fwd2.out_gain)
    np.testing.assert_array_equal(voted, plain)


def test_sim_majority_plan_matches_global():
    """A plan assigning k to every layer must reproduce the global-k
    simulation exactly (same seed, same draws)."""
    from redsec_tpu.utils.noise_sim import agreement_estimate

    rng = np.random.default_rng(3)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(8, 8, 8, 1)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    p = get_params("small_v2_tpu")
    info = rr.resolve_pbs_ranges(plan, p.msg_space, input_gain=True,
                                 sigma_units=p.mod_switch_sigma_units())
    a_g = agreement_estimate(plan, x, p, info, trials=4, seed=2, majority=3)
    a_p = agreement_estimate(plan, x, p, info, trials=4, seed=2,
                             majority_plan={i: 3 for i in range(len(plan.layers))})
    assert a_g["agreement_mean"] == a_p["agreement_mean"]


def test_sim_majority_improves_noisy_agreement():
    """Under real small_v2_tpu noise the simulator must show majority-3 >=
    single-PBS agreement on the mini net (the mechanism's whole purpose)."""
    from redsec_tpu.utils.noise_sim import agreement_estimate

    rng = np.random.default_rng(3)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(12, 8, 8, 1)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    p = get_params("small_v2_tpu")
    info = rr.resolve_pbs_ranges(plan, p.msg_space, input_gain=True,
                                 sigma_units=p.mod_switch_sigma_units())
    a1 = agreement_estimate(plan, x, p, info, trials=6, seed=2)
    a3 = agreement_estimate(plan, x, p, info, trials=6, seed=2, majority=3)
    assert a3["agreement_mean"] >= a1["agreement_mean"] - 1e-9, (a1, a3)
