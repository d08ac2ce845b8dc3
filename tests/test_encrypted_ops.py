"""Encrypted-vs-plaintext equivalence tests for the operator library.

Strategy (SURVEY.md §4): the plaintext engine is the oracle.  With noiseless
keys the leveled path (conv/pool/bias) is EXACT; bootstrapped activations
match up to the bootstrap's 2N rotation granularity, so tests either use
margin-safe values or assert high agreement + identical argmax.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto.params import TEST_NOISELESS
from redsec_tpu.formats.varprep import VarPrepWriter
from redsec_tpu.models.dims import Dimensions
from redsec_tpu.models.spec import (
    Activation,
    BiasKind,
    ConvKind,
    ConvParams,
    Domain,
    LayerSpec,
    ModelSpec,
    PoolKind,
    PoolParams,
    prep_model,
)
from redsec_tpu.runtime.encrypted import (
    build_encrypted_forward,
    decrypt_scores,
    encrypt_images,
)
from redsec_tpu.runtime.ptxt import build_forward


@pytest.fixture(scope="module")
def keys():
    sk, cloud = kg.keygen(TEST_NOISELESS, seed=11)
    return sk, cloud, bs.prepare_cloud_key(cloud)


def make_mini_sign_net(rng):
    """8x8x1 input -> SumPool2x2+Sign -> Conv3x3(4)+Sign+MaxPool -> FC(6)+Sign
    -> FC_FINAL(3): exercises every Bin operator."""
    spec = ModelSpec(
        "test/mini_sign",
        Dimensions(h=8, w=8, in_dep=1, in_bits=5, up_bound=30, scale=15.0),
        [
            LayerSpec(Domain.INT, ConvKind.NONE, 1, PoolKind.SUM, Activation.SIGN,
                      BiasKind.NONE, pool_params=PoolParams((2, 2), (2, 2))),
            LayerSpec(Domain.BIN, ConvKind.CONV, 4, PoolKind.MAX, Activation.SIGN,
                      BiasKind.BNORM, conv_params=ConvParams((3, 3), (1, 1), True),
                      pool_params=PoolParams((2, 2), (2, 2))),
            LayerSpec(Domain.BIN, ConvKind.FC, 6, PoolKind.NONE, Activation.SIGN,
                      BiasKind.BNORM),
            LayerSpec(Domain.BIN, ConvKind.FC_FINAL, 3, PoolKind.NONE,
                      Activation.NONE, BiasKind.NONE),
        ],
    )
    wr = VarPrepWriter()
    wr.write_i32(np.array([1]))  # layer0 bias
    wr.write_tern(rng.choice([-1, 0, 1], size=3 * 3 * 1 * 4))
    wr.write_i32(rng.integers(-3, 4, size=4))
    wr.write_tern(rng.choice([-1, 0, 1], size=2 * 2 * 4 * 6))
    wr.write_i32(rng.integers(-3, 4, size=6))
    wr.write_tern(rng.choice([-1, 0, 1], size=6 * 3))
    wr.write_i32(rng.integers(-3, 4, size=3))
    return spec, wr.getvalue()


def test_mini_sign_net_layerwise_self_consistency(keys):
    """Every encrypted layer matches the plaintext oracle applied to the
    DECRYPTED layer input: leveled stages exactly, bootstrapped stages
    everywhere except within the mod-switch noise band of the sign boundary.

    (End-to-end outputs then differ from pure-plaintext runs only through
    near-boundary sign flips — the same robustness margin the reference's
    encrypted path has, SURVEY.md §6.)
    """
    from redsec_tpu.crypto.bootstrap import make_batched_bootstrap
    from redsec_tpu.models.spec import Activation
    from redsec_tpu.ops import encrypted as eops
    from redsec_tpu.runtime import ptxt as rp

    sk, cloud, dkey = keys
    params = TEST_NOISELESS
    pbs = make_batched_bootstrap(dkey)
    rng = np.random.default_rng(0)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)

    x = rng.integers(-15, 16, size=(4, 8, 8, 1)).astype(np.int32)
    xc = jnp.asarray(encrypt_images(sk, x, params, rng))

    def dec(ct):
        return lwe.decrypt_integers(sk.lwe_key, np.asarray(ct), params)

    # noise band derived from params: 5 sigma of the mod-switch rounding of
    # the n mask coefficients to the 2N rotation grid
    NOISE_BAND = params.noise_band_units()

    n_outside = [0]  # across all layers, the exactness contract must bite

    def check_sign(pre_ptxt, got, ctx):
        """Margin-band contract: every disagreement sits within the noise
        band of the sign boundary, and every out-of-band point is EXACT."""
        want = np.where(pre_ptxt >= 0, 1, -1)
        bad = got != want
        assert np.abs(pre_ptxt[bad]).max(initial=0) <= NOISE_BAND, (
            ctx, pre_ptxt[bad])
        outside = np.abs(pre_ptxt) > NOISE_BAND
        n_outside[0] += int(outside.sum())
        np.testing.assert_array_equal(got[outside], want[outside], err_msg=ctx)

    for li, layer in enumerate(plan.layers):
        x_in = dec(xc)  # decrypted current activations (oracle input)
        if layer.conv is not None:
            xc = eops.conv_enc(layer.conv, xc, params.msg_space)
            want = np.asarray(rp.conv_ptxt(layer.conv, jnp.asarray(x_in)))
            np.testing.assert_array_equal(dec(xc), want, err_msg=f"conv L{li}")
        if layer.sumpool is not None:
            x_in = dec(xc)
            xc = eops.sumpool_enc(layer.sumpool, xc)
            want = np.asarray(rp.sumpool_ptxt(layer.sumpool, jnp.asarray(x_in)))
            np.testing.assert_array_equal(dec(xc), want, err_msg=f"pool L{li}")
        q = layer.quant
        x_in = dec(xc)
        if q.mode == Activation.SIGN:
            V = (eops.maxpool_sign_value(layer.maxpool, params)
                 if layer.maxpool is not None else 1)
            xc = eops.quant_sign_enc(q, xc, pbs, params, V)
            check_sign(x_in + q.bias, np.sign(dec(xc)), f"sign L{li}")
        elif q.mode == Activation.NONE:
            xc = eops.quant_add_bias_enc(q, xc, params)
            np.testing.assert_array_equal(dec(xc), x_in + q.bias, f"bias L{li}")
        if layer.maxpool is not None:
            x_in = dec(xc)  # +-V encodings from the feeding sign stage
            xc = eops.maxpool_enc(layer.maxpool, xc, pbs, params)
            mp = layer.maxpool
            V = eops.maxpool_sign_value(mp, params)
            want = np.sign(np.asarray(rp.maxpool_ptxt(mp, jnp.asarray(x_in))))
            got = dec(xc)
            # margin-band contract on the OR pre-activation sum + (count-1)V:
            # disagreements only within the band, out-of-band exact.  The V
            # scaling makes the margin V >> band, so this is a REAL contract
            # (mini-net maxpool is valid-pooled: count = window area).
            assert V > NOISE_BAND
            patches = np.asarray(rp.gather_patches(
                jnp.asarray(x_in), mp.window, mp.stride, mp.offset,
                (mp.out_h, mp.out_w)))
            area = mp.window[0] * mp.window[1]
            pre = patches.sum(axis=(3, 4)) + (area - 1) * V
            bad = got != want
            assert np.abs(pre[bad]).max(initial=0) <= NOISE_BAND, (
                f"maxpool L{li}", pre[bad])
            outside = np.abs(pre) > NOISE_BAND
            n_outside[0] += int(outside.sum())
            np.testing.assert_array_equal(
                got[outside], want[outside], err_msg=f"maxpool L{li}")

    assert n_outside[0] > 50  # the exactness contract must bite overall


@pytest.mark.slow
def test_full_jit_encrypted_forward_runs(keys):
    """The single-jit end-to-end program compiles and yields sane +-range scores."""
    sk, cloud, dkey = keys
    rng = np.random.default_rng(0)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(2, 8, 8, 1)).astype(np.int32)
    ct = encrypt_images(sk, x, TEST_NOISELESS, rng)
    fwd = build_encrypted_forward(plan, dkey)
    scores = decrypt_scores(sk, fwd(jnp.asarray(ct)), TEST_NOISELESS,
                            fwd.out_gain)
    assert scores.shape == (2, 3)
    assert np.abs(scores).max() <= 12  # |fan-in 6 + bias 3| bound


def _staircase(slope, bias, slope_bits, top, v):
    return np.clip(
        (slope.astype(np.int64)[None, :] * v[:, None].astype(np.int64)
         + bias[None, :]) >> slope_bits, 0, top)


@pytest.mark.slow
def test_relu_fdfb_full_range(keys):
    """Full-range FDFB relu (3 PBS) computes the DoReFa staircase for |v| up
    to msize/2 — double the quarter-range implementation's domain and equal
    to the reference's sign-then-MUX relu budget (IntFunc.cpp:860-973).

    Contract (margin-band, like every bootstrapped stage): values whose
    distance from a staircase step boundary — at BOTH torus representatives
    v and v-msize/2, since odd/even parts each read F there — exceeds the
    mod-switch noise band are exact; all values are within one step."""
    from redsec_tpu.crypto.bootstrap import make_batched_bootstrap
    from redsec_tpu.models.spec import QuantPlan
    from redsec_tpu.ops import encrypted as eops

    sk, cloud, dkey = keys
    params = TEST_NOISELESS
    msize = params.msg_space
    pbs = make_batched_bootstrap(dkey)
    C = 4
    # slope <= 4 keeps every staircase step >= 2^7/4 = 32 units wide (2x the
    # noise band), so mid-step points exist everywhere
    slope = np.array([4, 2, 3, 4], np.uint32)
    bias = np.array([-96, 64, 0, 288], np.int32)
    plan = QuantPlan(
        mode=Activation.RELU, bias=bias, slope=slope,
        shift_bits=3, slope_bits=7, in_bits=9, h=1, w=1, depth=C,
    )
    top = 7
    v = np.arange(-500, 502, 2, dtype=np.int32)
    vals = np.broadcast_to(v[:, None], (v.size, C)).reshape(v.size, 1, 1, C)
    rng = np.random.default_rng(6)
    ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, params, rng))
    out = eops.quant_relu_fdfb_enc(plan, ct, pbs, params)
    got = lwe.decrypt_integers(sk.lwe_key, np.asarray(out), params)
    got = got.reshape(v.size, C)

    want = _staircase(slope, bias, 7, top, v)
    # mod-switch noise band: n=64 mask coefficients rounded to 2N slots, each
    # slot = 2 message units -> ~2 slots sigma; 16 units is > 3 sigma
    BAND = 16
    stable = np.ones((v.size, C), bool)
    for d in (-BAND, BAND):
        for rep in (0, -msize // 2):  # both torus representatives
            w = ((v + rep + d + msize // 2) % msize) - msize // 2
            stable &= _staircase(slope, bias, 7, top, w) == _staircase(
                slope, bias, 7, top,
                ((v + rep + msize // 2) % msize) - msize // 2)
    assert stable.mean() > 0.5  # the contract must bite
    np.testing.assert_array_equal(got[stable], want[stable])
    # unstable points land on one of the two adjacent steps
    assert np.abs(got - want).max() <= 2


def test_relu_fdfb_beyond_quarter_range(keys):
    """Mid-step values in (msize/4, msize/2) — where the quarter-range relu
    wraps — are exactly right under FDFB."""
    from redsec_tpu.crypto.bootstrap import make_batched_bootstrap
    from redsec_tpu.models.spec import QuantPlan
    from redsec_tpu.ops import encrypted as eops

    sk, cloud, dkey = keys
    params = TEST_NOISELESS
    pbs = make_batched_bootstrap(dkey)
    plan = QuantPlan(
        mode=Activation.RELU, bias=np.array([0], np.int32),
        slope=np.array([8], np.uint32),
        shift_bits=4, slope_bits=8, in_bits=9, h=1, w=1, depth=1,
    )
    # F = clamp(v >> 5): steps at multiples of 32; v = 16 (mod 32) sits
    # mid-step at both representatives (512 = 0 mod 32)
    v = np.array([-400, -304, 272, 368, 464], np.int32)
    vals = v.reshape(-1, 1, 1, 1)
    rng = np.random.default_rng(7)
    ct = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, vals, params, rng))
    got = lwe.decrypt_integers(
        sk.lwe_key,
        np.asarray(eops.quant_relu_fdfb_enc(plan, ct, pbs, params)), params)
    want = np.clip(v.astype(np.int64) >> 5, 0, 15).reshape(vals.shape)
    np.testing.assert_array_equal(got, want)
    # and the quarter-range implementation demonstrably wraps out there
    bad = lwe.decrypt_integers(
        sk.lwe_key,
        np.asarray(eops.quant_relu_enc(plan, ct, pbs, params)), params)
    assert not np.array_equal(bad, want)


def test_staged_forward_matches_full_jit(keys):
    """jit="staged" (per-layer leveled programs + host macro-batched PBS — the
    mode large nets auto-route to) is bit-identical to the whole-model jit.

    pbs_macro=7 forces the macro-batch loop (incl. the padded tail) on every
    PBS boundary: sign, maxpool, and the final bias layer of the mini net.
    """
    sk, cloud, dkey = keys
    rng = np.random.default_rng(3)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    x = rng.integers(-15, 16, size=(2, 8, 8, 1)).astype(np.int32)
    ct = jnp.asarray(encrypt_images(sk, x, TEST_NOISELESS, rng))
    want = np.asarray(build_encrypted_forward(plan, dkey, jit=True)(ct))
    got = np.asarray(
        build_encrypted_forward(plan, dkey, jit="staged", pbs_chunk=16,
                                pbs_macro=7)(ct))
    np.testing.assert_array_equal(got, want)


def test_staged_forward_relu_matches_full_jit(keys):
    """Staged mode through the per-activation-test-vector (relu) PBS boundary,
    where tv is [m, N] rather than a broadcast [N]."""
    sk, cloud, dkey = keys
    rng = np.random.default_rng(4)
    spec = ModelSpec(
        "test/relu_staged",
        Dimensions(h=1, w=1, in_dep=16, in_bits=3, up_bound=4, scale=1.0),
        [
            LayerSpec(Domain.INT, ConvKind.FC, 8, PoolKind.NONE, Activation.RELU,
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
    wr.write_tern(rng.choice([-1, 0, 1], size=8 * 3))
    wr.write_i32(rng.integers(-4, 5, size=3))
    plan = prep_model(spec, wr.getvalue())
    x = rng.integers(-1, 2, size=(2, 1, 1, 16)).astype(np.int32)
    ct = jnp.asarray(encrypt_images(sk, x, TEST_NOISELESS, rng))
    want = np.asarray(build_encrypted_forward(plan, dkey, jit=True)(ct))
    got = np.asarray(
        build_encrypted_forward(plan, dkey, jit="staged", pbs_chunk=8,
                                pbs_macro=5)(ct))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_jit_auto_routes_wide_shallow_net_to_staged(keys):
    """A shallow net whose biggest layer exceeds pbs_macro must pick staged
    (the per-program bootstrap ceiling dominates the depth heuristic)."""
    sk, cloud, dkey = keys
    rng = np.random.default_rng(5)
    spec, blob = make_mini_sign_net(rng)
    plan = prep_model(spec, blob)
    fwd = build_encrypted_forward(plan, dkey, jit="auto", pbs_macro=4)
    assert fwd.mode == "staged"
    x = rng.integers(-15, 16, size=(1, 8, 8, 1)).astype(np.int32)
    ct = jnp.asarray(encrypt_images(sk, x, TEST_NOISELESS, rng))
    want = np.asarray(build_encrypted_forward(plan, dkey, jit=True)(ct))
    np.testing.assert_array_equal(np.asarray(fwd(ct)), want)


def test_leveled_only_exactness(keys):
    """conv + sumpool + add_bias with no bootstraps decrypts EXACTLY."""
    sk, cloud, dkey = keys
    rng = np.random.default_rng(1)
    spec = ModelSpec(
        "test/leveled",
        Dimensions(h=6, w=6, in_dep=2, in_bits=4, up_bound=16, scale=8.0),
        [
            LayerSpec(Domain.INT, ConvKind.CONV, 3, PoolKind.SUM, Activation.NONE,
                      BiasKind.NONE, conv_params=ConvParams((3, 3), (1, 1), True),
                      pool_params=PoolParams((2, 2), (2, 2))),
        ],
    )
    wr = VarPrepWriter()
    wr.write_tern(rng.choice([-1, 0, 1], size=3 * 3 * 2 * 3))
    wr.write_i32(rng.integers(-5, 6, size=3))
    plan = prep_model(spec, wr.getvalue())

    x = rng.integers(-8, 9, size=(2, 6, 6, 2)).astype(np.int32)
    want = np.asarray(build_forward(plan)(jnp.asarray(x)))
    ct = encrypt_images(sk, x, TEST_NOISELESS, rng)
    fwd = build_encrypted_forward(plan, dkey)
    got = decrypt_scores(sk, fwd(jnp.asarray(ct)), TEST_NOISELESS, fwd.out_gain)
    np.testing.assert_array_equal(got.reshape(want.shape), want)


def test_relu_layer_encrypted(keys):
    """Int relu_shift via per-channel programmable bootstrap vs ptxt."""
    sk, cloud, dkey = keys
    rng = np.random.default_rng(2)
    spec = ModelSpec(
        "test/relu",
        Dimensions(h=1, w=1, in_dep=16, in_bits=3, up_bound=4, scale=1.0),
        [
            LayerSpec(Domain.INT, ConvKind.FC, 8, PoolKind.NONE, Activation.RELU,
                      BiasKind.BNORM, conv_params=ConvParams(tern_thresh=0.1),
                      shift_bits=3),
            LayerSpec(Domain.INT, ConvKind.FC, 3, PoolKind.NONE, Activation.NONE,
                      BiasKind.NONE),
        ],
    )
    wr = VarPrepWriter()
    wr.write_tern(rng.choice([-1, 0, 1], size=16 * 8))
    # bias/slope picked so staircase steps are wide vs rotation granularity
    wr.write_i32(rng.integers(-64, 64, size=8))
    wr.write_i32(np.full(8, 16), signed=False)  # slope
    wr.write_tern(rng.choice([-1, 0, 1], size=8 * 3))
    wr.write_i32(rng.integers(-4, 5, size=3))
    plan = prep_model(spec, wr.getvalue())

    x = rng.integers(-1, 2, size=(3, 1, 1, 16)).astype(np.int32)
    want = np.asarray(build_forward(plan)(jnp.asarray(x)))
    ct = encrypt_images(sk, x, TEST_NOISELESS, rng)
    fwd = build_encrypted_forward(plan, dkey)
    got = decrypt_scores(sk, fwd(jnp.asarray(ct)), TEST_NOISELESS, fwd.out_gain)
    got = got.reshape(want.shape)
    # relu staircase boundaries at granularity can shift a unit; argmax robust
    assert (got.argmax(1) == want.argmax(1)).all()
    assert np.abs(got - want).max() <= 24, (got, want)
