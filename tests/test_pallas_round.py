"""Fused Pallas round kernels: bit-parity with the XLA path (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto.params import SMALL_V2_NOISELESS, TEST_NOISELESS
from redsec_tpu.crypto.pallas_round import make_full_round_kernel, make_round_kernel


@pytest.mark.slow
def test_full_round_kernel_matches_xla_round():
    P = SMALL_V2_NOISELESS  # N=1024 -> lane-native 8x128 split
    plan = bs._bootstrap_plan(P)
    rows, N = P.decomp_rows, P.N
    rng = np.random.default_rng(0)
    M = 3
    acc = rng.integers(-2**31, 2**31, size=(M, 2, N)).astype(np.int32)
    t = rng.integers(0, 2 * N, size=(M,)).astype(np.int32)
    bk = rng.integers(0, plan.primes[0], size=(2, rows, 8, N)).astype(np.int32)

    # reference: rotate -> decompose -> partial kernel -> accumulate
    def rotate_ref(polys, tt):
        out = polys
        for k in range(P.log2_2N):
            s = 1 << k
            rx = (np.concatenate([-out[..., N - s:], out[..., : N - s]], axis=-1)
                  if s < N else -out)
            bit = ((tt >> k) & 1).astype(bool).reshape(-1, 1, 1)
            out = np.where(bit, rx, out)
        return out

    rot = rotate_ref(acc.astype(np.int64), t).astype(np.int32)
    diff = (rot - acc).astype(np.int32)
    offset = 0
    for j in range(P.l):
        offset = (offset + (P.half_bg << (32 - (j + 1) * P.bg_bit))) & 0xFFFFFFFF
    u = (diff.astype(np.int64) & 0xFFFFFFFF) + offset
    digs = [(((u >> (32 - (j + 1) * P.bg_bit)) & (P.bg - 1)) - P.half_bg)
            for j in range(P.l)]
    digits = np.stack(digs, axis=2).reshape(M, rows, N).astype(np.int32)

    inner = make_round_kernel(P, plan, tile=4, interpret=True)
    want = (acc.astype(np.int64)
            + np.asarray(inner(jnp.asarray(digits), jnp.asarray(bk)))).astype(np.int32)

    krn = make_full_round_kernel(P, plan, tile=4, interpret=True)
    got = np.asarray(krn(jnp.asarray(acc), jnp.asarray(t), jnp.asarray(bk)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_kernel_bootstrap_matches_host_oracle(monkeypatch):
    monkeypatch.setenv("REDSEC_ROUND_KERNEL", "1")
    monkeypatch.setenv("REDSEC_NTT", "matmul")  # kernel tables' ordering
    P = TEST_NOISELESS
    sk, cloud = kg.keygen(P, seed=42)
    dkey = bs.prepare_cloud_key(cloud)
    pbs = bs.make_batched_bootstrap(dkey)
    ct = lwe.encrypt_integers(sk.lwe_key, np.array([100, -100]), P,
                              np.random.default_rng(3))
    tv = bs.const_test_vector(P, 1, P.msg_space)
    dev = np.asarray(pbs(jnp.asarray(ct), jnp.asarray(tv)))
    host = bs.bootstrap_host(cloud, ct[0], tv)
    np.testing.assert_array_equal(dev[0], host)
