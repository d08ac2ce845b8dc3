"""Conv-schoolbook external product / bootstrap (the device path for the
``medium``/``large`` parameter sets, which have no int32-range NTT primes —
client/gen_secure_keyset.cpp:9-45)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto import ntt as ntt_mod
from redsec_tpu.crypto.params import MEDIUM, TEST_NOISELESS


def test_schoolbook_matches_ntt_path(monkeypatch):
    """Forcing the schoolbook path on an NTT-capable set must be bit-identical
    (both are exact mod-2^32 arithmetic)."""
    P = TEST_NOISELESS
    sk, cloud = kg.keygen(P, seed=11)
    rng = np.random.default_rng(5)
    vals = rng.integers(-300, 300, size=(5,))
    vals[vals == 0] = 1
    ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, P, rng))
    tv = jnp.asarray(bs.const_test_vector(P, 1, P.msg_space))

    monkeypatch.delenv("REDSEC_FORCE_SCHOOLBOOK", raising=False)
    dkey = bs.prepare_cloud_key(cloud)
    assert dkey.plan is not None
    want = np.asarray(bs.make_batched_bootstrap(dkey)(ct, tv))

    monkeypatch.setenv("REDSEC_FORCE_SCHOOLBOOK", "1")
    dkey_sb = bs.prepare_cloud_key(cloud)
    assert dkey_sb.plan is None
    got = np.asarray(bs.make_batched_bootstrap(dkey_sb)(ct, tv))

    np.testing.assert_array_equal(got, want)


def test_medium_geometry_bootstrap_vs_host_oracle():
    """Device schoolbook bootstrap at the medium set's geometry (N=4096,
    Bg=2^10, l=3 — two digit limbs exercise the dl x bl recombination)
    against the int64 host oracle, on a reduced round count."""
    P = dataclasses.replace(MEDIUM, name="medium_tiny", n=6,
                            alpha_ks=0.0, alpha_bk=0.0, alpha_enc=0.0)
    sk, cloud = kg.keygen(P, seed=3)
    dkey = bs.prepare_cloud_key(cloud)
    assert dkey.plan is None

    rng = np.random.default_rng(9)
    vals = np.array([37, -1200])
    cts = np.stack([lwe.encrypt_integers(sk.lwe_key, np.array([v]), P, rng)[0]
                    for v in vals])
    tv = bs.const_test_vector(P, 1, P.msg_space)

    got = np.asarray(bs.make_batched_bootstrap(dkey)(jnp.asarray(cts), jnp.asarray(tv)))
    for b in range(len(vals)):
        want = bs.bootstrap_host(cloud, cts[b], tv)
        np.testing.assert_array_equal(got[b], want)

    dec = lwe.decrypt_integers(sk.lwe_key, got, P)
    np.testing.assert_array_equal(dec, np.where(vals >= 0, 1, -1))


def test_medium_keygen_roundtrip():
    """Full-size medium keys generate and the LWE layer round-trips."""
    P = MEDIUM
    rng = np.random.default_rng(0)
    key = lwe.lwe_key_gen(rng, P.n)
    vals = rng.integers(-2000, 2000, size=(32,))
    ct = lwe.encrypt_integers(key, vals, P, rng)
    dec = lwe.decrypt_integers(key, ct, P)
    np.testing.assert_array_equal(dec, vals)


def test_schoolbook_chunked_matches_batched(monkeypatch):
    """The lax.map chunked PBS (whole-model runtime path) over the schoolbook
    external product."""
    import jax.numpy as jnp2

    monkeypatch.setenv("REDSEC_FORCE_SCHOOLBOOK", "1")
    P = TEST_NOISELESS
    sk, cloud = kg.keygen(P, seed=13)
    dkey = bs.prepare_cloud_key(cloud)
    rng = np.random.default_rng(8)
    vals = rng.integers(-300, 300, size=(7,))
    vals[vals == 0] = 1
    ct = jnp2.asarray(lwe.encrypt_integers(sk.lwe_key, vals, P, rng))
    tv = jnp2.asarray(bs.const_test_vector(P, 1, P.msg_space))
    want = np.asarray(bs.make_batched_bootstrap(dkey)(ct, tv))
    got = np.asarray(bs.make_chunked_bootstrap(dkey, chunk=3)(ct, tv))
    np.testing.assert_array_equal(got, want)
