"""Native C++ CGGI core: bit-exact parity with the JAX device pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto.params import TEST_NOISELESS

native = pytest.importorskip("redsec_tpu.native")
if not native.available():
    pytest.skip("native core unavailable (no g++?)", allow_module_level=True)


def test_native_matches_device():
    sk, cloud = kg.keygen(TEST_NOISELESS, seed=42)
    eng = native.NativeEngine(cloud)
    rng = np.random.default_rng(9)
    vals = rng.integers(-500, 500, size=16)
    ct = lwe.encrypt_integers(sk.lwe_key, vals, TEST_NOISELESS, rng)
    tv = bs.const_test_vector(TEST_NOISELESS, 1, TEST_NOISELESS.msg_space)
    got = eng.bootstrap(ct, tv)
    dkey = bs.prepare_cloud_key(cloud)
    dev = np.asarray(bs.make_batched_bootstrap(dkey)(jnp.asarray(ct), jnp.asarray(tv)))
    np.testing.assert_array_equal(got, dev)


def test_native_programmable_tv():
    sk, cloud = kg.keygen(TEST_NOISELESS, seed=1)
    eng = native.NativeEngine(cloud)
    params = TEST_NOISELESS

    def fn(u):
        return np.clip((u - 256) >> 3, 0, 7)

    tv = bs.function_test_vector(params, fn, params.msg_space)
    vals = np.array([0, 16, 64, -16, -64, 200])
    triv = lwe.lwe_noiseless_trivial(
        lwe.mod_switch_to_torus32(vals + 256, params.msg_space), params.n
    )
    out = eng.bootstrap(triv, tv)
    dec = lwe.decrypt_integers(sk.lwe_key, out, params)
    np.testing.assert_array_equal(dec, np.clip(vals >> 3, 0, 7))


def test_native_medium_geometry_matches_host():
    """Medium-set geometry (N=4096, Bg=2^10, l=3 -> 3-prime CRT with the
    64-bit-Barrett primes) on a reduced round count, vs the int64 host
    oracle and the device schoolbook path."""
    import dataclasses

    from redsec_tpu.crypto.params import MEDIUM

    P = dataclasses.replace(MEDIUM, name="medium_tiny", n=6,
                            alpha_ks=0.0, alpha_bk=0.0, alpha_enc=0.0)
    sk, cloud = kg.keygen(P, seed=5)
    eng = native.NativeEngine(cloud)
    rng = np.random.default_rng(6)
    vals = np.array([123, -800])
    ct = np.stack([lwe.encrypt_integers(sk.lwe_key, np.array([v]), P, rng)[0]
                   for v in vals])
    tv = bs.const_test_vector(P, 1, P.msg_space)
    got = eng.bootstrap(ct, tv)
    want = np.stack([bs.bootstrap_host(cloud, ct[b], tv) for b in range(2)])
    np.testing.assert_array_equal(got, want)
    dec = lwe.decrypt_integers(sk.lwe_key, got, P)
    np.testing.assert_array_equal(dec, np.where(vals >= 0, 1, -1))
