"""Polynomial-dimension (NTT-stage) sharding: bit-exact vs single device.

The BASELINE north star names "all-to-all for NTT stage exchanges if the
polynomial dimension is sharded"; these tests run that exchange on the
8-virtual-device CPU mesh and assert exact agreement with the single-device
four-step transform and the single-device bootstrap.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto import ntt as ntt_mod
from redsec_tpu.crypto import ntt_matmul as mm
from redsec_tpu.crypto.params import TEST_NOISELESS
from redsec_tpu.parallel.mesh import make_mesh
from redsec_tpu.parallel.ntt_shard import (
    make_ntt_poly_sharded,
    make_poly_sharded_bootstrap,
    poly_shard_viable,
    shard_cloud_key_poly,
)


@pytest.mark.parametrize(
    "N,sp",
    [(1024, 4), pytest.param(1024, 8, marks=pytest.mark.slow), (256, 2)],
)
def test_sharded_ntt_matches_single_device(N, sp):
    plan = ntt_mod.make_plan(N, max_operand=4, limb_bits=8, accum=10)
    assert poly_shard_viable(N, sp)
    mesh = make_mesh(8, tp=sp)
    R, C = mm._split_rc(N)
    rng = np.random.default_rng(7)
    # compile time dominates (6 shard_map programs per prime): the production
    # geometry checks one prime; the small geometry covers the full CRT set
    primes = [0] if N >= 1024 else range(len(plan.primes))
    for pi in primes:
        p = plan.primes[pi]
        x = rng.integers(0, p, size=(6, N), dtype=np.int64).astype(np.int32)
        fwd, inv = make_ntt_poly_sharded(plan, pi, mesh, axis="tp")
        got_f = np.asarray(fwd(jnp.asarray(x).reshape(6, R, C)))
        want_f = np.asarray(mm.ntt_device_mm(jnp.asarray(x), plan, pi))
        np.testing.assert_array_equal(got_f, want_f)
        got_i = np.asarray(inv(jnp.asarray(want_f))).reshape(6, N)
        want_i = np.asarray(mm.intt_device_mm(jnp.asarray(want_f), plan, pi))
        np.testing.assert_array_equal(got_i, want_i)


@pytest.fixture(scope="module")
def mm_env(request):
    import os

    old = os.environ.get("REDSEC_NTT")
    os.environ["REDSEC_NTT"] = "matmul"
    sk, cloud = kg.keygen(TEST_NOISELESS, seed=13)
    dkey = bs.prepare_cloud_key(cloud)
    assert dkey.ntt_flavor == "matmul"
    yield sk, cloud, dkey
    if old is None:
        os.environ.pop("REDSEC_NTT", None)
    else:
        os.environ["REDSEC_NTT"] = old


def test_poly_sharded_bootstrap_bit_exact(mm_env):
    """Whole bootstrap with poly axis sharded (sp=2, N=256 -> R=2) must be
    bit-identical to the single-device bootstrap (same exact CRT-NTT math,
    int32 mod-2^32 sums are order-independent)."""
    sk, cloud, dkey = mm_env
    params = TEST_NOISELESS
    rng = np.random.default_rng(3)
    vals = rng.integers(-400, 400, size=16)
    ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, params, rng))
    tv = bs.const_test_vector(params, 1, params.msg_space)

    want = np.asarray(bs.make_batched_bootstrap(dkey)(ct, jnp.asarray(tv)))

    mesh = make_mesh(8, tp=2)  # dp=4 x sp=2: batch AND poly sharded together
    fn = make_poly_sharded_bootstrap(dkey, mesh, axis="tp")
    got = np.asarray(fn(ct, tv))
    np.testing.assert_array_equal(got, want)

    # decrypt-level sanity: signs of the bootstrapped outputs
    dec = lwe.decrypt_integers(sk.lwe_key, got, params)
    np.testing.assert_array_equal(np.sign(dec), np.sign(vals))


def test_sharded_key_hbm_footprint(mm_env):
    """Each device holds 1/sp of the BK frequency axis (addressable shard
    sizes — the HBM motivation for poly sharding)."""
    _, _, dkey = mm_env
    mesh = make_mesh(8, tp=2)
    skey = shard_cloud_key_poly(dkey, mesh, axis="tp")
    for full, sh in zip(dkey.bk_ntt, skey.bk_ntt):
        shard_shapes = {s.data.shape for s in sh.addressable_shards}
        assert shard_shapes == {full.shape[:-1] + (full.shape[-1] // 2,)}


def test_radix2_key_rejected(mm_env):
    """A radix-2-ordered key must be refused (its frequency ordering does not
    block-shard)."""
    _, cloud, _ = mm_env
    import os

    old = os.environ.pop("REDSEC_NTT")
    try:
        dkey_r2 = bs.prepare_cloud_key(cloud)
    finally:
        os.environ["REDSEC_NTT"] = old
    assert dkey_r2.ntt_flavor == "radix2"
    mesh = make_mesh(8, tp=2)
    with pytest.raises(ValueError, match="matmul"):
        shard_cloud_key_poly(dkey_r2, mesh, axis="tp")


@pytest.mark.slow
def test_poly_sharded_bootstrap_production_geometry():
    """The poly-sharded bootstrap at FULL production geometry (small_v2_tpu:
    n=350, N=1024, sp=4 on the virtual mesh) is bit-identical to the
    single-device matmul-flavor bootstrap — lifts the correctness milestone
    from toy shapes to the shipped parameter point (VERDICT r2 #7)."""
    import os

    from redsec_tpu.crypto.params import get_params

    old = os.environ.get("REDSEC_NTT")
    os.environ["REDSEC_NTT"] = "matmul"
    try:
        params = get_params("small_v2_tpu")
        sk, cloud = kg.keygen(params, seed=21)
        dkey = bs.prepare_cloud_key(cloud)
        assert dkey.ntt_flavor == "matmul"
        rng = np.random.default_rng(4)
        vals = rng.integers(-1500, 1500, size=2)
        ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, params, rng))
        tv = bs.const_test_vector(params, 1, params.msg_space)

        want = np.asarray(bs.make_batched_bootstrap(dkey)(ct, jnp.asarray(tv)))
        mesh = make_mesh(8, tp=4)  # dp=2 x sp=4
        fn = make_poly_sharded_bootstrap(dkey, mesh, axis="tp")
        got = np.asarray(fn(ct, tv))
        np.testing.assert_array_equal(got, want)
        dec = lwe.decrypt_integers(sk.lwe_key, got, params)
        np.testing.assert_array_equal(np.sign(dec), np.sign(vals))
    finally:
        if old is None:
            os.environ.pop("REDSEC_NTT", None)
        else:
            os.environ["REDSEC_NTT"] = old


def test_exchange_bytes_per_round_estimate():
    """The per-round ICI exchange accounting matches the ~200 KB/ciphertext
    estimate documented for small_v2 (module docstring / PERFORMANCE.md)."""
    from redsec_tpu.crypto import ntt as ntt_mod
    from redsec_tpu.crypto.params import get_params
    from redsec_tpu.parallel.ntt_shard import exchange_bytes_per_round

    p = get_params("small_v2")
    plan = ntt_mod.make_plan(p.N, max_operand=p.half_bg, limb_bits=8,
                             accum=p.decomp_rows, balanced=True)
    ex = exchange_bytes_per_round(p, plan, sp=4)
    # rows=20 x N=1024 x 4 B x 2 primes x 3/4 = 123 KB fwd; +inv and gather
    assert 150_000 < ex["total"] < 300_000, ex
    # tpu point: fewer rows -> less traffic
    p2 = get_params("small_v2_tpu")
    plan2 = ntt_mod.make_plan(p2.N, max_operand=p2.half_bg, limb_bits=8,
                              accum=p2.decomp_rows, balanced=True)
    ex2 = exchange_bytes_per_round(p2, plan2, sp=4)
    assert ex2["fwd_all_to_all"] < ex["fwd_all_to_all"]
