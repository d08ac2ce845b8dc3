"""Encrypted execution engine: run a prepped model over LWE ciphertext tensors.

The cloud side of the reference's ``make cpu-encrypt`` flow
(nets/mnist/sign1024x1/net.cpp:117-131): evaluation key in, encrypted image
in, encrypted class scores out.  All layers of a model run inside jit; the
only data-dependent sizes are resolved at trace time from the ModelPlan.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.bootstrap import DeviceCloudKey, make_chunked_bootstrap
from ..models.spec import Activation, ModelPlan
from ..ops import encrypted as eops


def build_encrypted_forward(
    model: ModelPlan, dkey: DeviceCloudKey, jit: bool = True, pbs_chunk: int = 1024
) -> Callable[[jax.Array], jax.Array]:
    """Build the encrypted forward: int32 [B, H, W, C, n+1] -> [B, classes, n+1].

    The returned function is a single jitted program; each sign/relu/maxpool
    stage performs one batched bootstrap over all its activations, processed
    in ``pbs_chunk``-sized slices to bound the working set.
    """
    params = dkey.params
    pbs_fn = make_chunked_bootstrap(dkey, chunk=pbs_chunk)

    def forward(x: jax.Array) -> jax.Array:
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

    return jax.jit(forward) if jit else forward


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
