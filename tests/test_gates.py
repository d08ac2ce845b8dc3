"""Truth-table tests for the bootstrapped gate library."""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto.gates import GateSet, gate_decrypt_host, gate_encrypt_host
from redsec_tpu.crypto.params import TEST_NOISELESS


@pytest.fixture(scope="module")
def env():
    sk, cloud = kg.keygen(TEST_NOISELESS, seed=21)
    dkey = bs.prepare_cloud_key(cloud)
    return sk, GateSet(dkey)


def _enc(sk, bits):
    return jnp.asarray(
        gate_encrypt_host(sk.lwe_key, np.asarray(bits), TEST_NOISELESS,
                          np.random.default_rng(0))
    )


def _dec(sk, ct):
    return gate_decrypt_host(sk.lwe_key, np.asarray(ct), TEST_NOISELESS)


def test_two_input_gates(env):
    sk, g = env
    a = np.array([0, 0, 1, 1])
    b = np.array([0, 1, 0, 1])
    ca, cb = _enc(sk, a), _enc(sk, b)
    cases = {
        "AND": a & b, "OR": a | b, "NAND": 1 - (a & b), "NOR": 1 - (a | b),
        "XOR": a ^ b, "XNOR": 1 - (a ^ b),
        "ANDNY": (1 - a) & b, "ANDYN": a & (1 - b),
        "ORNY": (1 - a) | b, "ORYN": a | (1 - b),
    }
    for name, want in cases.items():
        got = _dec(sk, getattr(g, name)(ca, cb))
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_not_copy_constant_mux(env):
    sk, g = env
    a = np.array([0, 1, 0, 1])
    s = np.array([0, 0, 1, 1])
    b = np.array([1, 1, 0, 0])
    ca, cb, cs = _enc(sk, a), _enc(sk, b), _enc(sk, s)
    np.testing.assert_array_equal(_dec(sk, g.NOT(ca)), 1 - a)
    np.testing.assert_array_equal(_dec(sk, g.COPY(ca)), a)
    np.testing.assert_array_equal(_dec(sk, g.CONSTANT(True, ca)), np.ones(4))
    np.testing.assert_array_equal(_dec(sk, g.MUX(cs, ca, cb)), np.where(s, a, b))


def test_ripple_add(env):
    sk, g = env
    rng = np.random.default_rng(5)
    x = rng.integers(0, 8, size=4)
    y = rng.integers(0, 8, size=4)
    xb = np.stack([(x >> i) & 1 for i in range(3)], axis=-1)  # [B, 3] LSB first
    yb = np.stack([(y >> i) & 1 for i in range(3)], axis=-1)
    cx = _enc(sk, xb)
    cy = _enc(sk, yb)
    s, carry = g.ripple_add(cx, cy)
    sbits = _dec(sk, s)
    cbit = _dec(sk, carry)
    got = (sbits * (2 ** np.arange(3))).sum(-1) + cbit * 8
    np.testing.assert_array_equal(got, x + y)
