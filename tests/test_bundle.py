"""2-bit bundled blind rotation (bundle=2).

The bundled CMUX evaluates X^(a_i*s_i + a_j*s_j) per round via the expansion
acc + BK_i.D(u) + BK_j.D(v) + BK_ij.D(w) (crypto/bootstrap.py blind_rotate),
halving the number of sequential rounds.  Bundled and plain rounds compute
the SAME encrypted plaintext through DIFFERENT linear combinations of BK
rows (gadget decomposition is nonlinear, so D(v), D(w) differ from the plain
second round's D(x2)) — ciphertext components legitimately differ, but with
noiseless keys the PHASES must agree up to gadget-truncation error
(<= ~2^(32-l*bg_bit) per coefficient; measured max 2392 torus units against
a 4.2M-unit message slot).  Any error in the expansion, the pair-key
interleave, or the 3*rows digit packing blows far past that band.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto.params import TEST_NOISELESS, SMALL_V2_TPU
from redsec_tpu.crypto.torus import mod_switch_to_torus32


def test_bundled_bitexact_noiseless():
    P = TEST_NOISELESS
    sk, cloud2 = kg.keygen(P, seed=7, bundle=2)
    # same seed without bundling must give the same base keys
    sk1, cloud1 = kg.keygen(P, seed=7)
    np.testing.assert_array_equal(cloud1.bk, cloud2.bk)
    np.testing.assert_array_equal(cloud1.ksk, cloud2.ksk)
    assert cloud2.bk_pair is not None and cloud2.bk_pair.shape[0] == P.n // 2

    dkey1 = bs.prepare_cloud_key(cloud1)
    dkey2 = bs.prepare_cloud_key(cloud2)
    assert dkey1.bundle == 1 and dkey2.bundle == 2
    assert dkey2.bk_ntt[0].shape[0] == P.n // 2
    assert dkey2.bk_ntt[0].shape[1] == 3 * P.decomp_rows

    rng = np.random.default_rng(8)
    vals = rng.integers(-500, 500, size=16)
    ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, P, rng))
    tv = jnp.asarray(bs.const_test_vector(P, 1, P.msg_space))

    out1 = np.asarray(bs.make_batched_bootstrap(dkey1)(ct, tv))
    out2 = np.asarray(bs.make_batched_bootstrap(dkey2)(ct, tv))
    ph1 = lwe.lwe_phase(sk.lwe_key, out1).astype(np.int64)
    ph2 = lwe.lwe_phase(sk.lwe_key, out2).astype(np.int64)
    d = (ph2 - ph1 + 2**31) % 2**32 - 2**31
    assert np.abs(d).max() < 2 ** 14, np.abs(d).max()  # truncation band only

    # and both decrypt to the correct signs
    for out in (out1, out2):
        dec = lwe.decrypt_integers(sk.lwe_key, out, P)
        np.testing.assert_array_equal(dec, np.where(vals >= 0, 1, -1))


def test_bundled_chunked_and_function_tv():
    """Bundled key through the CHUNKED path with a programmable test vector:
    must decrypt identically to the plain key on the same inputs/tv."""
    P = TEST_NOISELESS
    sk, cloud = kg.keygen(P, seed=9, bundle=2)
    dkey2 = bs.prepare_cloud_key(cloud)
    dkey1 = bs.prepare_cloud_key(kg.keygen(P, seed=9)[1])
    pbs2 = bs.make_chunked_bootstrap(dkey2, chunk=8)
    pbs1 = bs.make_chunked_bootstrap(dkey1, chunk=8)

    rng = np.random.default_rng(10)
    vals = rng.integers(-200, 200, size=20)  # inside the quarter range
    ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, P, rng))
    tv = jnp.asarray(bs.function_test_vector(
        P, lambda v: np.where(v >= 0, np.minimum(v, 63), 0), P.msg_space))
    out2 = np.asarray(pbs2(ct, tv))
    out1 = np.asarray(pbs1(ct, tv))
    np.testing.assert_array_equal(
        lwe.decrypt_integers(sk.lwe_key, out2, P),
        lwe.decrypt_integers(sk.lwe_key, out1, P))


@pytest.mark.slow
def test_bundled_noise_small_v2_tpu():
    """Bundled rounds add 3 external products per 2 bits (vs 2): output noise
    grows ~sqrt(1.5)x — must stay well under one message slot."""
    P = SMALL_V2_TPU
    sk, cloud = kg.keygen(P, seed=11, bundle=2)
    dkey = bs.prepare_cloud_key(cloud)
    pbs = bs.make_batched_bootstrap(dkey)

    rng = np.random.default_rng(12)
    B = 32
    vals = rng.integers(60, 1500, size=B) * rng.choice([-1, 1], size=B)
    ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, P, rng))
    tv = jnp.asarray(bs.const_test_vector(P, 1, P.msg_space))
    out = np.asarray(pbs(ct, tv))

    dec = lwe.decrypt_integers(sk.lwe_key, out, P)
    np.testing.assert_array_equal(dec, np.where(vals >= 0, 1, -1))

    mu = int(mod_switch_to_torus32(1, P.msg_space))
    want = np.where(vals >= 0, mu, -mu).astype(np.int64)
    err = lwe.lwe_phase(sk.lwe_key, out).astype(np.int64) - want
    err = (err + 2**31) % 2**32 - 2**31
    slots = err / (2.0**32 / P.msg_space)
    assert np.abs(slots).max() < 0.6, slots
    assert slots.std() < 0.15, slots.std()
