"""DoReFa/relu trainer leg (compiler/train_relu.py, VERDICT r4 #6).

Contract mirrors the sign trainer's: after train -> export_var_dat1 ->
weight_convert -> prep_model, the plaintext engine must reproduce the
trainer's hard forward BIT-FOR-BIT (logits, not just argmax) — the
converter-emulation guarantee that makes the BYON cycle trustworthy.
"""

import numpy as np
import pytest

from redsec_tpu.models.dims import Dimensions
from redsec_tpu.models.spec import (
    Activation, BiasKind, ConvKind, ConvParams, Domain, LayerSpec, ModelSpec,
    PoolKind, PoolParams,
)


def _mini_relu_spec():
    """8x8 ternary input -> SumPool2x2 -> FC32 BNORM RELU(sh=3) ->
    FC16 BNORM RELU(sh=4) -> FC3: two staircase layers with different
    scale/slope_bits resolutions."""
    return ModelSpec(
        "test/mini_relu",
        Dimensions(h=8, w=8, in_dep=1, in_bits=2, up_bound=2, scale=1.0),
        [
            LayerSpec(Domain.INT, ConvKind.NONE, 1, PoolKind.SUM,
                      Activation.NONE, BiasKind.NONE,
                      pool_params=PoolParams((2, 2), (2, 2))),
            LayerSpec(Domain.INT, ConvKind.FC, 32, PoolKind.NONE,
                      Activation.RELU, BiasKind.BNORM,
                      conv_params=ConvParams(tern_thresh=0.1), shift_bits=3),
            LayerSpec(Domain.INT, ConvKind.FC, 16, PoolKind.NONE,
                      Activation.RELU, BiasKind.BNORM,
                      conv_params=ConvParams(tern_thresh=0.1), shift_bits=4),
            LayerSpec(Domain.INT, ConvKind.FC, 3, PoolKind.NONE,
                      Activation.NONE, BiasKind.NONE,
                      conv_params=ConvParams(tern_thresh=0.1)),
        ],
    )


def _data(n=48, seed=3):
    rng = np.random.default_rng(seed)
    px = rng.integers(-1, 2, size=(n, 8, 8, 1)).astype(np.int32)
    labels = rng.integers(0, 3, size=n)
    return px, labels


def test_geometry_recurrence():
    from redsec_tpu.compiler.train_relu import _relu_geometry

    geom, lead = _relu_geometry(_mini_relu_spec())
    assert lead == (2, 2)
    assert [g["shape"] for g in geom] == [(1, 1, 16, 32), (1, 1, 32, 16),
                                         (1, 1, 16, 3)]
    # converter recurrence: scale 1*4 -> sc_b=2, sb=8+2-3=7; then scale=7
    # -> sc_b=3, sb=8+3-4=7; final no relu
    assert geom[0]["scale"] == 4.0 and geom[0]["slope_bits"] == 7
    assert geom[1]["scale"] == 7.0 and geom[1]["slope_bits"] == 7
    assert not geom[2]["relu"]


def test_hard_walk_matches_exported_pipeline_untrained():
    """Even at random init, the float64 hard walk equals the exported
    plaintext engine bit-for-bit (the emulation is exact, not trained-in)."""
    import jax.numpy as jnp

    from redsec_tpu.compiler.train_relu import (
        _hard_walk, export_trained_relu, init_relu_params)
    from redsec_tpu.compiler.weight_convert import weight_convert
    from redsec_tpu.models.spec import prep_model
    from redsec_tpu.runtime.ptxt import build_forward

    spec = _mini_relu_spec()
    px, _ = _data()
    params = init_relu_params(spec, seed=1)
    want, _ = _hard_walk(spec, params, px)
    prep = weight_convert(spec, export_trained_relu(spec, params, px))
    plan = prep_model(spec, prep)
    got = np.asarray(build_forward(plan)(jnp.asarray(px)))
    np.testing.assert_array_equal(got.reshape(want.shape), want)


@pytest.mark.slow
def test_train_and_export_relu_self_check():
    from redsec_tpu.compiler.train_relu import (
        ReluTrainConfig, train_and_export_relu)

    spec = _mini_relu_spec()
    px, labels = _data()
    cfg = ReluTrainConfig(steps=300, log_every=150, bound=600.0)
    raw, prep, report = train_and_export_relu(spec, px, labels, cfg)
    assert report["logits_bit_exact"], report
    assert report["twin_vs_ptxt_agreement"] == 1.0
    assert report["train_acc_twin"] >= 0.9, report
    assert len(raw) > 0 and len(prep) > 0
