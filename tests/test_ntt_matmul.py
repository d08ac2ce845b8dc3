"""Four-step MXU matmul NTT: exactness across sizes/primes and order contract."""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import ntt
from redsec_tpu.crypto.ntt_matmul import (
    _split_rc,
    intt_device_mm,
    ntt_device_mm,
    supported,
)


def test_split_rc():
    assert _split_rc(1024) == (8, 128)
    assert _split_rc(2048) == (16, 128)
    assert _split_rc(256) == (2, 128)
    assert supported(1024) and supported(2048) and supported(256)


@pytest.mark.parametrize("N", [256, 1024, 2048])
def test_roundtrip_and_convolution(N):
    plan = ntt.make_plan(N, max_operand=4, limb_bits=8, accum=20)
    rng = np.random.default_rng(0)
    for pi, p in enumerate(plan.primes):
        x = rng.integers(0, p, size=(3, N)).astype(np.int64)
        back = np.asarray(
            intt_device_mm(ntt_device_mm(jnp.asarray(x, jnp.int32), plan, pi), plan, pi)
        )
        np.testing.assert_array_equal(back, x)

        # negacyclic product parity against the host radix-2 oracle (orders
        # differ internally; products are order-agnostic)
        a = rng.integers(-4, 4, size=N).astype(np.int64)
        b = rng.integers(0, 256, size=N).astype(np.int64)
        want = ntt.intt_host(
            ntt.ntt_host(a % p, plan, pi) * ntt.ntt_host(b, plan, pi) % p, plan, pi
        )
        ya = ntt_device_mm(jnp.asarray(a % p, jnp.int32), plan, pi)
        yb = ntt_device_mm(jnp.asarray(b, jnp.int32), plan, pi)
        got = np.asarray(intt_device_mm(ntt._mulmod_device(ya, yb, p), plan, pi))
        np.testing.assert_array_equal(got, want)


def test_full_value_range():
    """Torus-limb x digit products at extreme values stay exact."""
    N = 1024
    plan = ntt.make_plan(N, max_operand=4, limb_bits=8, accum=20)
    for pi, p in enumerate(plan.primes):
        edge = np.full(N, p - 1, dtype=np.int64)
        got = np.asarray(
            intt_device_mm(ntt_device_mm(jnp.asarray(edge, jnp.int32), plan, pi), plan, pi)
        )
        np.testing.assert_array_equal(got, edge)
