"""Encrypted execution engine: run a prepped model over LWE ciphertext tensors.

The cloud side of the reference's ``make cpu-encrypt`` flow
(nets/mnist/sign1024x1/net.cpp:117-131): evaluation key in, encrypted image
in, encrypted class scores out.  All layers of a model run inside jit; the
only data-dependent sizes are resolved at trace time from the ModelPlan.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np

from ..crypto.bootstrap import DeviceCloudKey, make_chunked_impl
from ..models.spec import Activation, ModelPlan
from ..ops import encrypted as eops


def build_layer_impls(model: ModelPlan, params, plan, pbs_chunk: int = 512):
    """Per-layer un-jitted forwards ``impl(bk_ntt, ksk_limbs, x) -> x'`` plus
    a final flatten. Lets callers jit layer-by-layer: large nets (CIFAR) as a
    single whole-model HLO can exceed what a remote compile service accepts.
    """
    pbs_impl = make_chunked_impl(params, plan, chunk=pbs_chunk)

    def mk(layer):
        def run(bk_ntt, ksk_limbs, x):
            def pbs_fn(ct, tv):
                return pbs_impl(bk_ntt, ksk_limbs, ct, tv)

            if layer.conv is not None:
                x = eops.conv_enc(layer.conv, x, params.msg_space)
            if layer.sumpool is not None:
                x = eops.sumpool_enc(layer.sumpool, x)
            q = layer.quant
            if q.mode == Activation.SIGN:
                x = eops.quant_sign_enc(q, x, pbs_fn, params)
            elif q.mode == Activation.NONE:
                x = eops.quant_add_bias_enc(q, x, params)
            else:
                x = eops.quant_relu_enc(q, x, pbs_fn, params)
            if layer.maxpool is not None:
                x = eops.maxpool_enc(layer.maxpool, x, pbs_fn, params)
            return x

        return run

    return [mk(layer) for layer in model.layers]


def build_forward_impl(
    model: ModelPlan, params, plan, pbs_chunk: int = 512
) -> Callable:
    """Un-jitted encrypted forward taking the evaluation key as arguments:
    ``impl(bk_ntt, ksk_limbs, x [B,H,W,C,n+1]) -> [B, classes, n+1]``.

    Keys must be runtime arguments, not closure constants — constants embed
    the ~330 MB key into the serialized HLO (see crypto/bootstrap.py).
    """
    pbs_impl = make_chunked_impl(params, plan, chunk=pbs_chunk)

    def forward(bk_ntt, ksk_limbs, x: jax.Array) -> jax.Array:
        def pbs_fn(ct, tv):
            return pbs_impl(bk_ntt, ksk_limbs, ct, tv)

        for layer in model.layers:
            if layer.conv is not None:
                x = eops.conv_enc(layer.conv, x, params.msg_space)
            if layer.sumpool is not None:
                x = eops.sumpool_enc(layer.sumpool, x)
            q = layer.quant
            if q.mode == Activation.SIGN:
                x = eops.quant_sign_enc(q, x, pbs_fn, params)
            elif q.mode == Activation.NONE:
                x = eops.quant_add_bias_enc(q, x, params)
            else:
                x = eops.quant_relu_enc(q, x, pbs_fn, params)
            if layer.maxpool is not None:
                x = eops.maxpool_enc(layer.maxpool, x, pbs_fn, params)
        return x.reshape(x.shape[0], -1, x.shape[-1])

    return forward


def build_encrypted_forward(
    model: ModelPlan, dkey: DeviceCloudKey, jit="auto", pbs_chunk: int = 512
) -> Callable[[jax.Array], jax.Array]:
    """Encrypted forward bound to a device key:
    int32 [B, H, W, C, n+1] -> [B, classes, n+1].

    ``jit``: True = one whole-model program; "layer" = one program per layer
    (for nets whose single HLO exceeds the compile service's limits);
    "auto" = whole-model below 8 layers, per-layer above; False = eager.
    """
    from ..crypto.bootstrap import _key_material

    impl = build_forward_impl(model, dkey.params, dkey.plan, pbs_chunk)
    key_arg = _key_material(dkey)
    if jit == "auto":
        jit = True if len(model.layers) < 8 else "layer"

    if jit == "layer":
        layer_fns = [jax.jit(f) for f in
                     build_layer_impls(model, dkey.params, dkey.plan, pbs_chunk)]

        def forward(x: jax.Array) -> jax.Array:
            for f in layer_fns:
                x = f(key_arg, dkey.ksk_limbs, x)
            return x.reshape(x.shape[0], -1, x.shape[-1])
    else:
        fn = jax.jit(impl) if jit else impl

        def forward(x: jax.Array) -> jax.Array:
            return fn(key_arg, dkey.ksk_limbs, x)

    forward.impl = impl
    return forward


def encrypt_images(sk, images: np.ndarray, params, rng=None) -> np.ndarray:
    """Client-side: encrypt converted-pixel images [B, H, W, C] -> ciphertext
    tensor [B, H, W, C, n+1] (client/encrypt_image.cpp:73-80)."""
    from ..crypto import lwe

    rng = rng or np.random.default_rng(0)
    return lwe.encrypt_integers(sk.lwe_key, images, params, rng)


def decrypt_scores(sk, scores_ct: np.ndarray, params) -> np.ndarray:
    """Client-side: decrypt class-score ciphertexts [B, classes, n+1] ->
    signed integers (client/decrypt_image.cpp:46-63)."""
    from ..crypto import lwe

    return lwe.decrypt_integers(sk.lwe_key, np.asarray(scores_ct), params)
