"""Exactness tests for the CRT negacyclic NTT (host and device paths)."""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import ntt


def naive_negacyclic(a, b, N):
    out = np.zeros(N, dtype=object)
    for i in range(N):
        for j in range(N):
            k = i + j
            if k < N:
                out[k] += int(a[i]) * int(b[j])
            else:
                out[k - N] -= int(a[i]) * int(b[j])
    return out


@pytest.mark.parametrize("N", [16, 64, 256])
def test_host_ntt_roundtrip(N):
    plan = ntt.make_plan(N, max_operand=4)
    rng = np.random.default_rng(0)
    for pi, p in enumerate(plan.primes):
        x = rng.integers(0, p, size=(3, N)).astype(np.int64)
        y = ntt.ntt_host(x, plan, pi)
        back = ntt.intt_host(y, plan, pi)
        np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("N", [16, 64])
def test_host_ntt_negacyclic_product(N):
    plan = ntt.make_plan(N, max_operand=4)
    rng = np.random.default_rng(1)
    a = rng.integers(-4, 4, size=N).astype(np.int64)
    b = rng.integers(0, 1 << 16, size=N).astype(np.int64)
    want = naive_negacyclic(a, b, N)
    for pi, p in enumerate(plan.primes):
        ya = ntt.ntt_host(a, plan, pi)
        yb = ntt.ntt_host(b, plan, pi)
        got = ntt.intt_host(ya * yb % p, plan, pi)
        np.testing.assert_array_equal(got, np.array([int(v) % p for v in want]))


@pytest.mark.parametrize("N", [64, 256, 1024])
def test_device_matches_host(N):
    plan = ntt.make_plan(N, max_operand=4)
    rng = np.random.default_rng(2)
    for pi, p in enumerate(plan.primes):
        x = rng.integers(0, p, size=(4, N)).astype(np.int64)
        host = ntt.ntt_host(x, plan, pi)
        dev = np.asarray(ntt.ntt_device(jnp.asarray(x, dtype=jnp.int32), plan, pi))
        np.testing.assert_array_equal(dev, host)
        hinv = ntt.intt_host(host, plan, pi)
        dinv = np.asarray(ntt.intt_device(jnp.asarray(host, dtype=jnp.int32), plan, pi))
        np.testing.assert_array_equal(dinv, hinv)


def test_mulmod_device_exhaustive_edges():
    """Edge-stress the fp32-reciprocal modmul on the largest prime."""
    p = 40961
    rng = np.random.default_rng(3)
    a = np.concatenate([rng.integers(0, p, 20000), np.array([0, 1, p - 1, p - 2])])
    b = np.concatenate([rng.integers(0, p, 20000), np.array([p - 1, p - 1, p - 1, 1])])
    got = np.asarray(
        ntt._mulmod_device(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), p)
    )
    np.testing.assert_array_equal(got, (a.astype(np.int64) * b) % p)


@pytest.mark.parametrize("nprimes_operand", [4, 512])
def test_crt_recombine_matches_schoolbook(nprimes_operand):
    """digit-poly x limb-split torus poly, CRT back to torus32 == schoolbook."""
    N = 64
    plan = ntt.make_plan(N, max_operand=nprimes_operand)
    rng = np.random.default_rng(4)
    d = rng.integers(-nprimes_operand, nprimes_operand, size=N).astype(np.int64)
    c = rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.int64)
    lo = c & 0xFFFF
    hi = (c >> 16) & 0xFFFF
    want = ntt.negacyclic_mul_host(d, c.astype(np.uint64).astype(np.uint32).astype(np.int32), N)

    def prod_part(limb):
        residues = []
        for pi, p in enumerate(plan.primes):
            yd = ntt.ntt_device(jnp.asarray(d % p, jnp.int32), plan, pi)
            yl = ntt.ntt_device(jnp.asarray(limb % p, jnp.int32), plan, pi)
            residues.append(ntt.intt_device(ntt._mulmod_device(yd, yl, p), plan, pi))
        return ntt.crt_to_torus32(residues, plan)

    got = np.asarray(prod_part(lo)) + (np.asarray(prod_part(hi)) << 16)
    np.testing.assert_array_equal(got.astype(np.int32), want)
