"""CGGI core tests: LWE roundtrips, bootstrap correctness, host/device parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto.params import SMALL_V2, TEST_NOISELESS, get_params


@pytest.fixture(scope="module")
def tiny_keys():
    return kg.keygen(TEST_NOISELESS, seed=42)


@pytest.fixture(scope="module")
def tiny_dkey(tiny_keys):
    _, cloud = tiny_keys
    return bs.prepare_cloud_key(cloud)


def test_lwe_roundtrip_noiseless(tiny_keys):
    sk, _ = tiny_keys
    rng = np.random.default_rng(0)
    vals = rng.integers(-512, 512, size=64)
    ct = lwe.encrypt_integers(sk.lwe_key, vals, TEST_NOISELESS, rng)
    dec = lwe.decrypt_integers(sk.lwe_key, ct, TEST_NOISELESS)
    np.testing.assert_array_equal(dec, vals)


def test_lwe_roundtrip_noisy():
    params = SMALL_V2
    rng = np.random.default_rng(1)
    key = lwe.lwe_key_gen(rng, params.n)
    vals = rng.integers(-2000, 2000, size=256)
    ct = lwe.encrypt_integers(key, vals, params, rng)
    dec = lwe.decrypt_integers(key, ct, params)
    np.testing.assert_array_equal(dec, vals)  # alpha=2^-15 << 1/8192 slot margin


def test_lwe_leveled_ops(tiny_keys):
    """Leveled adds/subs/scalar-muls are plain int32 vector ops (BinOps_enc.cpp:121-143)."""
    sk, _ = tiny_keys
    params = TEST_NOISELESS
    rng = np.random.default_rng(2)
    a = rng.integers(-150, 150, size=32)
    b = rng.integers(-150, 150, size=32)
    ca = lwe.encrypt_integers(sk.lwe_key, a, params, rng)
    cb = lwe.encrypt_integers(sk.lwe_key, b, params, rng)
    np.testing.assert_array_equal(
        lwe.decrypt_integers(sk.lwe_key, (ca + cb).astype(np.int32), params), a + b
    )
    np.testing.assert_array_equal(
        lwe.decrypt_integers(sk.lwe_key, (ca - cb).astype(np.int32), params), a - b
    )
    np.testing.assert_array_equal(
        lwe.decrypt_integers(sk.lwe_key, (3 * ca).astype(np.int32), params), 3 * a
    )
    triv = lwe.lwe_noiseless_trivial(
        np.asarray([lwe.mod_switch_to_torus32(7, params.msg_space)] * 32).reshape(32),
        params.n,
    )
    np.testing.assert_array_equal(
        lwe.decrypt_integers(sk.lwe_key, (ca + triv).astype(np.int32), params), a + 7
    )


def test_bootstrap_device_sign(tiny_keys, tiny_dkey):
    """Batched device bootstrap computes the sign: v >= 0 -> +1, v < 0 -> -1."""
    sk, _ = tiny_keys
    params = TEST_NOISELESS
    rng = np.random.default_rng(3)
    # mod-switching the mask to 2N=512 rotation slots adds rounding noise of a
    # few 4096-space units even with zero encryption noise, so test values stay
    # >= 128 away from the sign boundary (same situation as the reference:
    # one 4096-slot is below the n*round-off noise, SURVEY.md §6).
    vals = np.array([32, 500, 128, 75, -32, -500, -128, -75])
    ct = lwe.encrypt_integers(sk.lwe_key, vals, params, rng)
    tv = bs.const_test_vector(params, 1, params.msg_space)
    pbs = bs.make_batched_bootstrap(tiny_dkey)
    out = np.asarray(pbs(jnp.asarray(ct), jnp.asarray(tv)))
    dec = lwe.decrypt_integers(sk.lwe_key, out, params)
    want = np.where(vals >= 0, 1, -1)
    np.testing.assert_array_equal(dec, want)

    # trivial ciphertexts have no mask -> no mod-switch noise: the sign
    # boundary is exact at the 2N granularity (slot = msg_space/2N = 2 here)
    tvals = np.array([0, 2, 510, -2, -510, 250])
    triv = lwe.lwe_noiseless_trivial(
        lwe.mod_switch_to_torus32(tvals, params.msg_space), params.n
    )
    out = np.asarray(pbs(jnp.asarray(triv), jnp.asarray(tv)))
    dec = lwe.decrypt_integers(sk.lwe_key, out, params)
    np.testing.assert_array_equal(dec, np.where(tvals >= 0, 1, -1))


@pytest.mark.slow
def test_bootstrap_device_matches_host(tiny_keys, tiny_dkey):
    """Bit-exact ciphertext parity between the jitted device pipeline and the
    numpy reference implementation."""
    sk, cloud = tiny_keys
    params = TEST_NOISELESS
    rng = np.random.default_rng(4)
    vals = np.array([37, -512, 3, -3])
    ct = lwe.encrypt_integers(sk.lwe_key, vals, params, rng)
    tv = bs.const_test_vector(params, 1, params.msg_space)
    pbs = bs.make_batched_bootstrap(tiny_dkey)
    dev = np.asarray(pbs(jnp.asarray(ct), jnp.asarray(tv)))
    for i in range(len(vals)):
        host = bs.bootstrap_host(cloud, ct[i], tv)
        np.testing.assert_array_equal(dev[i], host)


def test_bootstrap_programmable(tiny_keys, tiny_dkey):
    """Function PBS: evaluate a ReLU staircase clamp(v>>3, 0, 7) in ONE
    bootstrap — the primitive behind the TPU-native relu_shift.

    A test vector is negacyclic, so the input is confined to the positive
    half-torus by pre-biasing with the known range R (half-torus trick):
    bootstrap(v + R) with tv(u) = f(u - R).
    """
    sk, _ = tiny_keys
    params = TEST_NOISELESS
    R = 256  # |v| < R, and 2R <= msg_space/2
    rng = np.random.default_rng(5)
    vals = np.array([0, 8, 16, 62, 64, 100, 254, -8, -100, -254])

    def fn(u):
        return np.clip((u - R) >> 3, 0, 7)

    tv = bs.function_test_vector(params, fn, params.msg_space)
    pbs = bs.make_batched_bootstrap(tiny_dkey)
    bias = lwe.mod_switch_to_torus32(np.full(len(vals), R), params.msg_space)

    # exact path: trivial ciphertexts (no mask -> no mod-switch rounding)
    triv = lwe.lwe_noiseless_trivial(
        lwe.mod_switch_to_torus32(vals, params.msg_space), params.n
    )
    triv[:, -1] = (triv[:, -1] + bias).astype(np.int32)
    out = np.asarray(pbs(jnp.asarray(triv), jnp.asarray(tv)))
    dec = lwe.decrypt_integers(sk.lwe_key, out, params)
    np.testing.assert_array_equal(dec, np.clip(vals >> 3, 0, 7))

    # encrypted path: staircase steps must exceed the mod-switch noise, so use
    # a coarse staircase (steps of 256) and step-centered inputs
    def fn_coarse(u):
        return np.clip((u - R) >> 6, 0, 1)

    cvals = np.array([32, 96, -32, -96])
    ct = lwe.encrypt_integers(sk.lwe_key, cvals, params, rng)
    ct[:, -1] = (ct[:, -1] + lwe.mod_switch_to_torus32(np.full(4, R), params.msg_space)).astype(np.int32)
    tv2 = bs.function_test_vector(params, fn_coarse, params.msg_space)
    out = np.asarray(pbs(jnp.asarray(ct), jnp.asarray(tv2)))
    dec = lwe.decrypt_integers(sk.lwe_key, out, params)
    np.testing.assert_array_equal(dec, np.clip(cvals >> 6, 0, 1))


def test_bootstrap_narrow_intermediates_bit_exact(tiny_keys, tiny_dkey, monkeypatch):
    """REDSEC_NARROW=1 (uint16 NTT-domain intermediates at the fusion
    boundaries) is a pure memory-layout change: outputs must be bit-identical
    to the default path (residues are in [0, prime) < 2^15, so the narrowing
    cast is lossless)."""
    sk, _ = tiny_keys
    params = TEST_NOISELESS
    rng = np.random.default_rng(9)
    vals = rng.integers(-500, 500, size=32)
    ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, params, rng))
    tv = jnp.asarray(bs.const_test_vector(params, 1, params.msg_space))
    want = np.asarray(bs.make_batched_bootstrap(tiny_dkey)(ct, tv))
    monkeypatch.setenv("REDSEC_NARROW", "1")
    got = np.asarray(bs.make_batched_bootstrap(tiny_dkey)(ct, tv))
    np.testing.assert_array_equal(got, want)
