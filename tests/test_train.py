"""BYON trainer (compiler/train.py): the exported toolchain round-trip.

The contract under test: after train -> export_var_dat1 -> weight_convert
-> prep_model, the plaintext engine's predictions are IDENTICAL to the
trainer's own hard-quantized forward — i.e. the trainer's float twin and
the packed inference pipeline implement the same function (the property the
reference never checks; its Larq twin and C++ build are compared only by
eyeball in Cifar_test.ipynb)."""

import numpy as np
import pytest

from redsec_tpu.models.dims import Dimensions
from redsec_tpu.models.spec import (
    Activation, BiasKind, ConvKind, ConvParams, Domain, LayerSpec, ModelSpec,
    PoolKind, PoolParams,
)


def _mini_spec():
    return ModelSpec(
        "test/mini_train",
        Dimensions(h=8, w=8, in_dep=1, in_bits=9, up_bound=255, scale=255.0),
        [
            LayerSpec(Domain.INT, ConvKind.NONE, 1, PoolKind.SUM,
                      Activation.SIGN, BiasKind.NONE,
                      pool_params=PoolParams((2, 2), (2, 2))),
            LayerSpec(Domain.BIN, ConvKind.CONV, 8, PoolKind.MAX,
                      Activation.SIGN, BiasKind.BNORM,
                      conv_params=ConvParams((3, 3), (1, 1), True,
                                             tern_thresh=0.05),
                      pool_params=PoolParams((2, 2), (2, 2))),
            LayerSpec(Domain.BIN, ConvKind.FC, 32, PoolKind.NONE,
                      Activation.SIGN, BiasKind.BNORM,
                      conv_params=ConvParams(tern_thresh=0.05)),
            LayerSpec(Domain.BIN, ConvKind.FC_FINAL, 4, PoolKind.NONE,
                      Activation.NONE, BiasKind.NONE,
                      conv_params=ConvParams(tern_thresh=0.05)),
        ])


def test_train_export_roundtrip_bit_exact():
    from redsec_tpu.compiler.train import TrainConfig, train_and_export

    rng = np.random.default_rng(3)
    px = rng.integers(-255, 256, size=(24, 8, 8, 1)).astype(np.int32)
    labels = rng.integers(0, 4, size=24).astype(np.int32)
    raw, prep, rep = train_and_export(
        _mini_spec(), px, labels, TrainConfig(steps=80, log_every=1000))
    assert rep["twin_vs_ptxt_agreement"] == 1.0, rep
    assert len(raw) > 0 and len(prep) > 0
    # training moved the twin off chance (4 classes, 24 random-label rows)
    assert rep["train_acc_twin"] >= 0.4


def test_margin_loss_shapes_margins():
    """With the margin hinge active, trained boundaries hold larger minimum
    integer margins than an untrained init (the mechanism the CIFAR
    positive control rests on)."""
    import jax.numpy as jnp

    from redsec_tpu.compiler.train import (
        TrainConfig, build_twin, init_params, train)

    spec = _mini_spec()
    rng = np.random.default_rng(5)
    px = rng.integers(-255, 256, size=(24, 8, 8, 1)).astype(np.int32)
    labels = rng.integers(0, 4, size=24).astype(np.int32)

    def frac_thin(vs, m=4.0):
        """Fraction of pre-PBS activations inside the +-m margin band (the
        mass the mod-switch noise can flip)."""
        tot = sum(np.asarray(v).size for v in vs)
        thin = sum(int((np.abs(np.asarray(v)) < m).sum()) for v in vs)
        return thin / tot

    fwd, _ = build_twin(spec)
    # isolate the mechanism: identical training except the margin terms
    p_off, _ = train(spec, px, labels,
                     TrainConfig(steps=150, log_every=1000, seed=5,
                                 lam_margin=0.0, hidden_noise=0.0))
    _, vs0 = fwd(p_off, jnp.asarray(px))
    p_on, _ = train(spec, px, labels,
                    TrainConfig(steps=150, log_every=1000, seed=5,
                                lam_margin=4.0, hidden_noise=0.0))
    _, vs1 = fwd(p_on, jnp.asarray(px))
    f0, f1 = frac_thin(vs0), frac_thin(vs1)
    assert f1 < f0, (f0, f1)
