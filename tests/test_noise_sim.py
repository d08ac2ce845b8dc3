"""Per-channel relu centering, model-input gains, and the Monte-Carlo noise
simulator (utils/noise_sim.py).

The centering mechanism re-encodes an asymmetric relu pre-activation range
[lo, hi] as +-(hi-lo)/2 via an exact per-channel ciphertext shift folded
back out by the staircase test vectors — required for nets whose raw ranges
exceed the message budget (relu1024x3: |v|max 2690 > 2048 at 100 calibration
images; the reference wraps silently there, lib/IntFunc.cpp:860-973).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto.params import TEST_NOISELESS, get_params
from redsec_tpu.models.spec import Activation
from redsec_tpu.runtime import ranges as rr

from test_ranges import _fc_relu_model


def test_staircase_center_fold_exact():
    """staircase(g*(x+s)) with center=s == staircase(g*x) without, for every
    integer x — the tv-side fold is exact."""
    from redsec_tpu.ops.encrypted import _staircase_i64

    plan = _fc_relu_model(n_in=16, n_out=8).layers[0].quant
    rng = np.random.default_rng(0)
    s = rng.integers(-50, 50, size=plan.depth).astype(np.int64)
    x = np.arange(-200, 200, dtype=np.int64)
    for g in (1, 4):
        want = _staircase_i64(plan, x * g, g)          # [C, M] of true x
        got = _staircase_i64(plan, (x[None, :] + s[:, None]).reshape(-1) * g,
                             g, center=None)
        # evaluate the centered vector at v' = g*(x+s) per channel
        got_c = np.stack([
            _staircase_i64(plan, (x + s[c]) * g, g, center=s)[c]
            for c in range(plan.depth)])
        np.testing.assert_array_equal(got_c, want)


def test_centered_relu_forward_is_reencoding_noop():
    """Per-channel centering is an exact re-encoding: the centered encrypted
    forward must decode IDENTICALLY to the uncentered one (noiseless keys).
    Centers are slot-aligned, so both runs share the same mod-switch grid."""
    import os

    from redsec_tpu.crypto import bootstrap as bs, keygen as kg
    from redsec_tpu.runtime.encrypted import (
        build_forward_impl, decrypt_scores, encrypt_images, model_out_gain,
    )

    plan = _fc_relu_model(n_in=16, n_out=8)
    rng = np.random.default_rng(7)
    # skewed inputs -> asymmetric relu pre-activation ranges
    x = rng.integers(0, 3, size=(12, 1, 1, 16)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    info = rr.resolve_pbs_ranges(plan, TEST_NOISELESS.msg_space)
    assert any(r.center is not None for r in info.values()), \
        "centering did not engage on the asymmetric range"
    assert all(r.center is None or (np.asarray(r.center) % 2 == 0).all()
               for r in info.values()), "centers must be slot-aligned"
    os.environ["REDSEC_CENTER"] = "0"
    try:
        info0 = rr.resolve_pbs_ranges(plan, TEST_NOISELESS.msg_space)
    finally:
        os.environ.pop("REDSEC_CENTER")
    assert all(r.center is None for r in info0.values())

    sk, cloud = kg.keygen(TEST_NOISELESS, seed=5)
    dkey = bs.prepare_cloud_key(cloud)
    ct = jnp.asarray(encrypt_images(sk, x[:4], TEST_NOISELESS, rng))

    def run(ii):
        impl = build_forward_impl(plan, dkey.params, dkey.plan, info=ii)
        out = impl(dkey.bk_ntt, dkey.ksk_limbs, ct)
        from redsec_tpu.runtime.encrypted import model_out_center
        return decrypt_scores(sk, np.asarray(out), TEST_NOISELESS,
                              model_out_gain(ii), model_out_center(ii))

    np.testing.assert_array_equal(run(info), run(info0))


def test_input_gain_forward_matches_oracle():
    """Client-side input gain (pixels encrypted at g0) decodes to the same
    scores as unit encoding (noiseless keys)."""
    from redsec_tpu.crypto import bootstrap as bs, keygen as kg
    from redsec_tpu.runtime.encrypted import (
        build_forward_impl, decrypt_scores, encrypt_images, model_in_gain,
        model_out_gain,
    )
    from redsec_tpu.runtime.ptxt import build_forward

    plan = _fc_relu_model(n_in=16, n_out=8)
    rng = np.random.default_rng(9)
    x = rng.integers(-1, 2, size=(8, 1, 1, 16)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    info = rr.resolve_pbs_ranges(plan, TEST_NOISELESS.msg_space,
                                 input_gain=True)
    g0 = model_in_gain(info)
    # g0 >= 2 puts every phase on the even rotation grid: the noiseless
    # encrypted forward is then EXACTLY the oracle (no slot rounding at all)
    assert g0 >= 2, "input gain did not engage"

    sk, cloud = kg.keygen(TEST_NOISELESS, seed=6)
    dkey = bs.prepare_cloud_key(cloud)
    ct = jnp.asarray(encrypt_images(sk, x[:4], TEST_NOISELESS, rng, gain=g0))
    impl = build_forward_impl(plan, dkey.params, dkey.plan, info=info)
    out = impl(dkey.bk_ntt, dkey.ksk_limbs, ct)
    from redsec_tpu.runtime.encrypted import model_out_center
    got = decrypt_scores(sk, np.asarray(out), TEST_NOISELESS,
                         model_out_gain(info), model_out_center(info))
    want = np.asarray(build_forward(plan)(jnp.asarray(x[:4])))
    np.testing.assert_array_equal(got, want)


def test_sim_noiseless_reproduces_oracle():
    """exact_layers=all (zero noise) must reproduce the oracle bit-exactly —
    validates the sim's encoded-domain plumbing (gains, centers, biases,
    staircase vectors, final wrap)."""
    from redsec_tpu.runtime.ptxt import build_forward
    from redsec_tpu.utils.noise_sim import simulate_forward

    plan = _fc_relu_model(n_in=16, n_out=8)
    rng = np.random.default_rng(3)
    x = rng.integers(-2, 3, size=(16, 1, 1, 16)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    p = get_params("small_v2_tpu")
    info = rr.resolve_pbs_ranges(plan, p.msg_space, input_gain=True)
    scores, _ = simulate_forward(plan, x, p, info, np.random.default_rng(0),
                                 exact_layers=set(range(len(plan.layers))))
    want = np.asarray(build_forward(plan)(jnp.asarray(x)))
    np.testing.assert_array_equal(scores, want)


@pytest.mark.slow
def test_sim_gain_monotonicity_on_shipped_net():
    """On sign1024x1 the sim must reproduce the measured ordering:
    gains-encoding agreement >> unit-encoding agreement (0.99 vs 0.79 on
    the TPU, PERFORMANCE.md round-2 table)."""
    import os

    ref = "/root/reference/nets/mnist/sign1024x1/var_prep.dat"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not mounted")
    from redsec_tpu.formats.image_io import load_csv_dataset, pixel_transform_for
    from redsec_tpu.models.spec import prep_model
    from redsec_tpu.models.zoo import get_model
    from redsec_tpu.utils.noise_sim import agreement_estimate

    plan = prep_model(get_model("mnist/sign1024x1"), ref)
    labels, px = load_csv_dataset(
        "/root/reference/nets/mnist/mnist_data.csv",
        plan.in_dim.h, plan.in_dim.w, plan.in_dim.in_dep, limit=50)
    x = pixel_transform_for("mnist/sign1024x1")(px)
    rr.calibrate_ranges(plan, x)
    p = get_params("small_v2_tpu")
    a_g = agreement_estimate(plan, x, p,
                             rr.resolve_pbs_ranges(plan, p.msg_space),
                             trials=3)
    a_u = agreement_estimate(plan, x, p,
                             rr.resolve_pbs_ranges(plan, p.msg_space,
                                                   gains=False),
                             trials=3)
    assert a_g["agreement_mean"] >= 0.94, a_g
    assert a_g["agreement_mean"] > a_u["agreement_mean"] + 0.03, (a_g, a_u)


def test_final_layer_decrypt_centering_rescues_wrapped_logits(monkeypatch):
    """Round-4 engine fix: logits beyond +-msg_space/2 wrap at decrypt and
    steal the argmax (the reference wraps silently the same way,
    decrypt_image.cpp:50-59; relu1024x3 images 3/23 were real casualties).
    Final-layer per-class decrypt centering keeps every class in range and
    the decryptor subtracts the public shifts back out."""
    from redsec_tpu.crypto import bootstrap as bs, keygen as kg
    from redsec_tpu.formats.varprep import VarPrepWriter
    from redsec_tpu.models.dims import Dimensions
    from redsec_tpu.models.spec import (
        Activation, BiasKind, ConvKind, ConvParams, Domain, LayerSpec,
        ModelSpec, prep_model,
    )
    from redsec_tpu.models.spec import PoolKind
    from redsec_tpu.runtime.encrypted import (
        build_forward_impl, decrypt_scores, encrypt_images, model_out_center,
        model_out_gain,
    )
    from redsec_tpu.runtime.ptxt import build_forward

    spec = ModelSpec(
        "test/wrap_final",
        Dimensions(h=1, w=1, in_dep=16, in_bits=2, up_bound=1, scale=0.5),
        [
            LayerSpec(Domain.BIN, ConvKind.FC, 8, PoolKind.NONE,
                      Activation.SIGN, BiasKind.BNORM,
                      conv_params=ConvParams(tern_thresh=0.1)),
            LayerSpec(Domain.BIN, ConvKind.FC_FINAL, 3, PoolKind.NONE,
                      Activation.NONE, BiasKind.BIAS,
                      conv_params=ConvParams(tern_thresh=0.1)),
        ],
    )
    rng = np.random.default_rng(11)
    wr = VarPrepWriter()
    wr.write_tern(rng.choice([-1, 0, 1], size=16 * 8))
    wr.write_i32(rng.integers(-2, 3, size=8))
    wr.write_tern(rng.choice([-1, 0, 1], size=8 * 3))
    # class-0 logits sit at ~600 > msg_space/2 = 512: decode wraps them
    # negative without centering
    wr.write_i32(np.array([600, 0, -600]))
    plan = prep_model(spec, wr.getvalue())

    x = rng.choice([-1, 1], size=(6, 1, 1, 16)).astype(np.int32)
    rr.calibrate_ranges(plan, x)
    info = rr.resolve_pbs_ranges(plan, TEST_NOISELESS.msg_space)
    assert info[1].center is not None, "final-layer centering did not engage"

    want = np.asarray(build_forward(plan)(jnp.asarray(x)))
    assert np.abs(want).max() > TEST_NOISELESS.msg_space // 2  # wrap-certain

    sk, cloud = kg.keygen(TEST_NOISELESS, seed=8)
    dkey = bs.prepare_cloud_key(cloud)
    ct = jnp.asarray(encrypt_images(sk, x, TEST_NOISELESS, rng))

    impl = build_forward_impl(plan, dkey.params, dkey.plan, info=info)
    out = impl(dkey.bk_ntt, dkey.ksk_limbs, ct)
    got = decrypt_scores(sk, np.asarray(out), TEST_NOISELESS,
                         model_out_gain(info), model_out_center(info))
    np.testing.assert_array_equal(got.argmax(1), want.argmax(1))

    # without centering the same pipeline demonstrably wraps the argmax
    monkeypatch.setenv("REDSEC_CENTER", "0")
    info0 = rr.resolve_pbs_ranges(plan, TEST_NOISELESS.msg_space)
    assert info0[1].center is None
    out0 = build_forward_impl(plan, dkey.params, dkey.plan, info=info0)(
        dkey.bk_ntt, dkey.ksk_limbs, ct)
    got0 = decrypt_scores(sk, np.asarray(out0), TEST_NOISELESS,
                          model_out_gain(info0))
    assert not (got0.argmax(1) == want.argmax(1)).all()
