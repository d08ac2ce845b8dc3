"""small_v2_tpu: the TPU-native performance parameter set (Bg=2^5, l=6).

Same lattice security as the reference's shipped default small_v2 (identical
n, N, noise rates); 12 decomposition rows instead of 20. The docstring claim
in crypto/params.py — per-bootstrap output noise well under one message slot,
so the n->2N mod-switch noise (~7.6 slots) stays the only accuracy driver —
is asserted empirically here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto.params import SMALL_V2_TPU
from redsec_tpu.crypto.torus import mod_switch_to_torus32


@pytest.mark.slow
def test_small_v2_tpu_bootstrap_noise_and_signs():
    P = SMALL_V2_TPU
    assert P.decomp_rows == 12 and P.l * P.bg_bit == 30  # same gadget precision
    sk, cloud = kg.keygen(P, seed=1)
    dkey = bs.prepare_cloud_key(cloud)
    pbs = bs.make_batched_bootstrap(dkey)

    rng = np.random.default_rng(2)
    B = 32
    vals = rng.integers(60, 1500, size=B) * rng.choice([-1, 1], size=B)
    ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, P, rng))
    tv = jnp.asarray(bs.const_test_vector(P, 1, P.msg_space))
    out = np.asarray(pbs(ct, tv))

    # comfortable margins (|v| >= 60 ~ 8 sigma of mod-switch noise): all signs
    dec = lwe.decrypt_integers(sk.lwe_key, out, P)
    np.testing.assert_array_equal(dec, np.where(vals >= 0, 1, -1))

    # output noise in message slots: phase - (+-mu), one slot = 2^32/4096
    mu = int(mod_switch_to_torus32(1, P.msg_space))
    want = np.where(vals >= 0, mu, -mu).astype(np.int64)
    err = (lwe_phase := lwe.lwe_phase(sk.lwe_key, out).astype(np.int64)) - want
    err = (err + 2**31) % 2**32 - 2**31  # wrap to signed
    slots = err / (2.0**32 / P.msg_space)
    assert np.abs(slots).max() < 1.0, slots
    assert slots.std() < 0.3, slots.std()


@pytest.mark.slow
def test_small_v2_tpu2_bootstrap_noise_and_signs():
    """small_v2_tpu2 (Bg=2^6 x l=5, 10 rows): the wider-base decomposition
    noise must stay well below the mod-switch noise even accumulated over
    1024-wide fan-ins (analysis in crypto/params.py)."""
    from redsec_tpu.crypto.params import SMALL_V2_TPU2

    P = SMALL_V2_TPU2
    assert P.decomp_rows == 10 and P.l * P.bg_bit == 30
    assert P.half_bg <= 127  # digits stay int8 across the fusion boundary
    sk, cloud = kg.keygen(P, seed=3)
    dkey = bs.prepare_cloud_key(cloud)
    pbs = bs.make_batched_bootstrap(dkey)

    rng = np.random.default_rng(4)
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
    assert np.abs(slots).max() < 0.8, slots
    assert slots.std() < 0.2, slots.std()
