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
