"""Whole-blind-rotation mega-kernel: bit-parity with the XLA bootstrap path
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto.params import TEST_NOISELESS


@pytest.mark.slow
def test_blind_kernel_bootstrap_matches_xla(monkeypatch):
    # the mega-kernel's tables use the four-step (matmul) NTT ordering; the
    # device key must be prepared in the same domain
    monkeypatch.setenv("REDSEC_NTT", "matmul")
    P = TEST_NOISELESS
    sk, cloud = kg.keygen(P, seed=7)
    dkey = bs.prepare_cloud_key(cloud)
    assert dkey.ntt_flavor == "matmul"
    rng = np.random.default_rng(3)
    vals = rng.integers(-300, 300, size=(6,))
    vals[vals == 0] = 1
    ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, P, rng))
    tv = jnp.asarray(bs.const_test_vector(P, 1, P.msg_space))

    monkeypatch.delenv("REDSEC_BLIND_KERNEL", raising=False)
    want = np.asarray(bs.make_batched_bootstrap(dkey)(ct, tv))

    monkeypatch.setenv("REDSEC_BLIND_KERNEL", "1")
    monkeypatch.setenv("REDSEC_BLIND_TILE", "4")
    got = np.asarray(bs.make_batched_bootstrap(dkey)(ct, tv))

    np.testing.assert_array_equal(got, want)
    dec = lwe.decrypt_integers(sk.lwe_key, got, P)
    np.testing.assert_array_equal(dec, np.where(vals >= 0, 1, -1))
