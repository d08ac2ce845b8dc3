"""Multi-chip sharding: sharded execution must equal single-device results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto.params import TEST_NOISELESS
from redsec_tpu.parallel.mesh import (
    build_dp_encrypted_forward,
    fc_sign_tp,
    make_mesh,
    shard_ciphertext_batch,
)


@pytest.fixture(scope="module")
def env():
    sk, cloud = kg.keygen(TEST_NOISELESS, seed=31)
    dkey = bs.prepare_cloud_key(cloud)
    return sk, dkey


@pytest.mark.slow
def test_dp_forward_matches_single_device(env):
    from test_encrypted_ops import make_mini_sign_net
    from redsec_tpu.models.spec import prep_model
    from redsec_tpu.runtime.encrypted import build_encrypted_forward, encrypt_images

    sk, dkey = env
    rng = np.random.default_rng(0)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(8, 8, 8, 1)).astype(np.int32)
    ct = jnp.asarray(encrypt_images(sk, x, TEST_NOISELESS, rng))

    single = np.asarray(build_encrypted_forward(plan, dkey)(ct))

    mesh = make_mesh(8, tp=2)
    sharded = build_dp_encrypted_forward(plan, dkey, mesh)
    got = np.asarray(sharded(shard_ciphertext_batch(ct, mesh)))
    np.testing.assert_array_equal(got, single)


@pytest.mark.slow
def test_dp_forward_bundled_key_matches_single_device():
    """Regression: build_dp_encrypted_forward must thread dkey.bundle into the
    forward impl — with a bundle=2 key the plain impl silently computed wrong
    results (clamped dynamic_index + broadcast over the 3*rows axis)."""
    from test_encrypted_ops import make_mini_sign_net
    from redsec_tpu.models.spec import prep_model
    from redsec_tpu.runtime.encrypted import build_encrypted_forward, encrypt_images

    sk, cloud = kg.keygen(TEST_NOISELESS, seed=33, bundle=2)
    dkey = bs.prepare_cloud_key(cloud)
    assert dkey.bundle == 2
    rng = np.random.default_rng(2)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(8, 8, 8, 1)).astype(np.int32)
    ct = jnp.asarray(encrypt_images(sk, x, TEST_NOISELESS, rng))

    single = np.asarray(build_encrypted_forward(plan, dkey)(ct))

    mesh = make_mesh(8, tp=2)
    sharded = build_dp_encrypted_forward(plan, dkey, mesh)
    got = np.asarray(sharded(shard_ciphertext_batch(ct, mesh)))
    np.testing.assert_array_equal(got, single)


@pytest.mark.slow
def test_tp_fc_sign_matches_single_device(env):
    sk, dkey = env
    params = TEST_NOISELESS
    rng = np.random.default_rng(1)
    B, K, O = 8, 32, 16
    w = rng.choice([-1, 0, 1], size=(K, O)).astype(np.int8)
    bias = rng.integers(-3, 4, size=O).astype(np.int32)
    bits = rng.choice([-1, 1], size=(B, K))
    x_ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, bits, params, rng))

    # single-device oracle
    from redsec_tpu.crypto.bootstrap import const_test_vector, make_batched_bootstrap
    from redsec_tpu.crypto.torus import mod_switch_to_torus32
    from redsec_tpu.ops.encrypted import ternary_matmul_ct

    full = np.array(ternary_matmul_ct(x_ct[:, None], jnp.asarray(w, jnp.int8))[:, 0])
    full[..., -1] = (full[..., -1] + mod_switch_to_torus32(bias, params.msg_space)).astype(np.int32)
    pbs = make_batched_bootstrap(dkey)
    tv = const_test_vector(params, 1, params.msg_space)
    want = np.asarray(pbs(jnp.asarray(full.reshape(-1, full.shape[-1])), jnp.asarray(tv)))
    want = want.reshape(B, O, -1)

    mesh = make_mesh(8, tp=2)
    x_sharded = jax.device_put(
        x_ct, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(("dcn", "dp"), "tp", None))
    )
    got = np.asarray(fc_sign_tp(x_sharded, w, bias, dkey, mesh))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_dcn_axis_simulated_two_hosts(env):
    """Simulated 2-host layout (dcn=2, dp=2, tp=2 on the 8-device CPU mesh):
    batch rides (dcn, dp); fan-in psum stays on tp (ICI-only by construction).
    Bit-exact vs single device."""
    sk, dkey = env
    params = TEST_NOISELESS
    rng = np.random.default_rng(4)
    B, K, O = 8, 32, 16
    w = rng.choice([-1, 0, 1], size=(K, O)).astype(np.int8)
    bias = rng.integers(-3, 4, size=O).astype(np.int32)
    bits = rng.choice([-1, 1], size=(B, K))
    x_ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, bits, params, rng))

    from redsec_tpu.crypto.bootstrap import const_test_vector, make_batched_bootstrap
    from redsec_tpu.crypto.torus import mod_switch_to_torus32
    from redsec_tpu.ops.encrypted import ternary_matmul_ct

    full = np.array(ternary_matmul_ct(x_ct[:, None], jnp.asarray(w, jnp.int8))[:, 0])
    full[..., -1] = (full[..., -1] + mod_switch_to_torus32(bias, params.msg_space)).astype(np.int32)
    pbs = make_batched_bootstrap(dkey)
    tv = const_test_vector(params, 1, params.msg_space)
    want = np.asarray(pbs(jnp.asarray(full.reshape(-1, full.shape[-1])), jnp.asarray(tv)))
    want = want.reshape(B, O, -1)

    mesh = make_mesh(8, tp=2, dcn=2)
    assert dict(mesh.shape) == {"dcn": 2, "dp": 2, "tp": 2}
    x_sharded = jax.device_put(
        x_ct, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(("dcn", "dp"), "tp", None))
    )
    got = np.asarray(fc_sign_tp(x_sharded, w, bias, dkey, mesh))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_tp_whole_model_matches_single_device(env):
    """build_tp_encrypted_forward (fan-in psum + output-channel resharded
    bootstraps across every layer) is BIT-exact vs the single-device forward
    on the mini sign net (conv/pool/sign/maxpool/fc), tp=2 x dp=4."""
    from test_encrypted_ops import make_mini_sign_net
    from redsec_tpu.models.spec import prep_model
    from redsec_tpu.parallel.mesh import build_tp_encrypted_forward
    from redsec_tpu.runtime.encrypted import build_encrypted_forward, encrypt_images

    sk, dkey = env
    rng = np.random.default_rng(5)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(8, 8, 8, 1)).astype(np.int32)
    ct = jnp.asarray(encrypt_images(sk, x, TEST_NOISELESS, rng))
    want = np.asarray(build_encrypted_forward(plan, dkey, jit=True)(ct))
    mesh = make_mesh(8, tp=2)
    fwd = build_tp_encrypted_forward(plan, dkey, mesh)
    got = np.asarray(fwd(ct))
    # conv(4 ch) and fc(6 ch) layers shard over tp=2; layer 0 is replicated
    assert fwd.tp_layout[1] == (False, True)
    assert fwd.tp_layout[2] == (True, True)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_tp_whole_model_relu_fdfb_matches_single_device(env):
    """The tp forward through quarter AND full-range (FDFB) relu layers,
    with per-channel test vectors sharded over tp."""
    from redsec_tpu.formats.varprep import VarPrepWriter
    from redsec_tpu.models.dims import Dimensions
    from redsec_tpu.models.spec import (
        Activation, BiasKind, ConvKind, ConvParams, Domain, LayerSpec,
        ModelSpec, PoolKind, prep_model,
    )
    from redsec_tpu.parallel.mesh import build_tp_encrypted_forward
    from redsec_tpu.runtime.encrypted import build_encrypted_forward, encrypt_images
    from redsec_tpu.runtime.ranges import calibrate_ranges

    sk, dkey = env
    rng = np.random.default_rng(6)
    spec = ModelSpec(
        "test/tp_relu",
        Dimensions(h=1, w=1, in_dep=16, in_bits=3, up_bound=4, scale=1.0),
        [
            LayerSpec(Domain.INT, ConvKind.FC, 8, PoolKind.NONE, Activation.RELU,
                      BiasKind.BNORM, conv_params=ConvParams(tern_thresh=0.1),
                      shift_bits=3),
            LayerSpec(Domain.INT, ConvKind.FC, 4, PoolKind.NONE, Activation.RELU,
                      BiasKind.BNORM, conv_params=ConvParams(tern_thresh=0.1),
                      shift_bits=3),
            LayerSpec(Domain.INT, ConvKind.FC, 3, PoolKind.NONE, Activation.NONE,
                      BiasKind.NONE),
        ],
    )
    wr = VarPrepWriter()
    wr.write_tern(rng.choice([-1, 0, 1], size=16 * 8))
    wr.write_i32(rng.integers(-64, 64, size=8))
    wr.write_i32(np.full(8, 16), signed=False)
    wr.write_tern(rng.choice([-1, 0, 1], size=8 * 4))
    wr.write_i32(rng.integers(-64, 64, size=4))
    wr.write_i32(np.full(4, 16), signed=False)
    wr.write_tern(rng.choice([-1, 0, 1], size=4 * 3))
    wr.write_i32(rng.integers(-4, 5, size=3))
    plan = prep_model(spec, wr.getvalue())
    # force mixed modes: L0 small bound -> quarter, L1 un-calibrated -> full
    x = rng.integers(-1, 2, size=(4, 1, 1, 16)).astype(np.int32)
    calibrate_ranges(plan, x)
    plan.layers[1].measured_pre_bound = None
    ct = jnp.asarray(encrypt_images(sk, x, TEST_NOISELESS, rng))
    want = np.asarray(build_encrypted_forward(plan, dkey, jit=True)(ct))
    mesh = make_mesh(8, tp=2)
    got = np.asarray(build_tp_encrypted_forward(plan, dkey, mesh)(ct))
    np.testing.assert_array_equal(got, want)
