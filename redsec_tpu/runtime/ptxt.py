"""Plaintext execution engine — the bit-exact oracle for the encrypted path.

Replaces the reference's ``make ptxt`` build (same sources, integer typedefs,
lib/Layer.h:50-53).  Activations live in the +-1 integer domain throughout
(the reference stores binary activations as bits {0,1} encoding {-1,+1},
BinLayer.h:34-35; we use the integers directly), so a layer is:

    conv/fc:   int32 matmul with plaintext ternary weights {-1,0,+1}
    sumpool:   strided window sum
    sign:      (x + bias) >= 0 -> +-1           (BinOps.cpp:207-217 via add)
    add_bias:  x + bias                          (BinFunc.cpp:1085-1107)
    relu:      clamp((x*slope + bias) >> slope_bits, 0, 2^shift-1)
                                                 (IntFunc.cpp:953-969 + IntOps)
    maxpool:   window max in the +-1 domain      (== bitwise OR, BinOps.cpp:180-193)

All arithmetic is int32 with two's-complement wraparound, matching the C++.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import Activation, ConvPlan, LayerPlan, ModelPlan, PoolPlan, QuantPlan


def gather_patches(x: jax.Array, window, stride, offset, out_hw, fill_value=0):
    """Extract conv/pool windows with boundary masking.

    ``x``: [B, H, W, C, ...] (any trailing dims).  Returns
    [B, OH, OW, wh, ww, C, ...] with out-of-bounds positions set to
    ``fill_value`` — the reference's zero-padding (BinFunc.cpp:271-294) and
    pool-window clipping (BinFunc.cpp:709-716).
    """
    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    wh, ww = window
    oh, ow = out_hw
    idx_h = jnp.arange(oh)[:, None] * stride[0] + jnp.arange(wh)[None, :] - offset[0]
    idx_w = jnp.arange(ow)[:, None] * stride[1] + jnp.arange(ww)[None, :] - offset[1]
    ok_h = (idx_h >= 0) & (idx_h < H)
    ok_w = (idx_w >= 0) & (idx_w < W)

    g = jnp.take(x, idx_h.clip(0, H - 1).reshape(-1), axis=1)
    g = g.reshape(B, oh, wh, *x.shape[2:])
    g = jnp.take(g, idx_w.clip(0, W - 1).reshape(-1), axis=3)
    g = g.reshape(B, oh, wh, ow, ww, *x.shape[3:])
    g = jnp.moveaxis(g, 3, 2)  # [B, OH, OW, wh, ww, C, ...]

    mask = ok_h[:, None, :, None] & ok_w[None, :, None, :]  # [OH, OW, wh, ww]
    mask = mask.reshape((1,) + mask.shape + (1,) * (g.ndim - 5))
    return jnp.where(mask, g, jnp.asarray(fill_value, dtype=x.dtype))


def conv_ptxt(plan: ConvPlan, x: jax.Array) -> jax.Array:
    """Ternary-weight convolution as patch-gather + int32 matmul
    (BinFunc.cpp:142-330 Loop1/Loop2 collapsed into one contraction)."""
    if plan.flatten:
        x = x.reshape(x.shape[0], 1, 1, -1)
    patches = gather_patches(
        x, (plan.weights.shape[0], plan.weights.shape[1]), plan.stride, plan.offset,
        (plan.out_h, plan.out_w),
    )
    B = x.shape[0]
    k = plan.weights.shape[0] * plan.weights.shape[1] * plan.in_dep
    patches = patches.reshape(B, plan.out_h * plan.out_w, k)
    w = jnp.asarray(plan.weights.reshape(k, plan.out_dep), dtype=x.dtype)
    out = jax.lax.dot_general(
        patches, w, (((2,), (0,)), ((), ())), preferred_element_type=x.dtype
    )
    if plan.neg_correction is not None:
        out = out - jnp.asarray(plan.neg_correction, dtype=x.dtype)
    return out.reshape(B, plan.out_h, plan.out_w, plan.out_dep)


def sumpool_ptxt(plan: PoolPlan, x: jax.Array) -> jax.Array:
    patches = gather_patches(x, plan.window, plan.stride, plan.offset, (plan.out_h, plan.out_w))
    return patches.sum(axis=(3, 4), dtype=x.dtype)


def maxpool_ptxt(plan: PoolPlan, x: jax.Array) -> jax.Array:
    patches = gather_patches(
        x, plan.window, plan.stride, plan.offset, (plan.out_h, plan.out_w),
        fill_value=jnp.iinfo(jnp.int32).min,
    )
    return patches.max(axis=(3, 4))


def quant_sign_ptxt(plan: QuantPlan, x: jax.Array) -> jax.Array:
    bias = jnp.asarray(plan.bias, dtype=x.dtype)
    return jnp.where(x + bias >= 0, 1, -1).astype(x.dtype)


def quant_add_bias_ptxt(plan: QuantPlan, x: jax.Array) -> jax.Array:
    return x + jnp.asarray(plan.bias, dtype=x.dtype)


def quant_relu_ptxt(plan: QuantPlan, x: jax.Array) -> jax.Array:
    """DoReFa discretized ReLU (IntFunc.cpp:953-969):
    y = (x*slope + bias) >> slope_bits, then clamp to [0, 2^shift_bits - 1]."""
    slope = jnp.asarray(plan.slope.astype(np.int32), dtype=jnp.int32)
    y = x * slope + jnp.asarray(plan.bias, dtype=jnp.int32)
    y = jnp.right_shift(y, plan.slope_bits)  # arithmetic shift on int32
    top = (1 << plan.shift_bits) - 1
    return jnp.clip(y, 0, top).astype(x.dtype)


def layer_forward_ptxt(plan: LayerPlan, x: jax.Array) -> jax.Array:
    if plan.conv is not None:
        x = conv_ptxt(plan.conv, x)
    if plan.sumpool is not None:
        x = sumpool_ptxt(plan.sumpool, x)
    q = plan.quant
    if q.mode == Activation.SIGN:
        x = quant_sign_ptxt(q, x)
    elif q.mode == Activation.NONE:
        x = quant_add_bias_ptxt(q, x)
    else:
        x = quant_relu_ptxt(q, x)
    if plan.maxpool is not None:
        x = maxpool_ptxt(plan.maxpool, x)
    return x


def build_forward(model: ModelPlan, jit: bool = True) -> Callable[[jax.Array], jax.Array]:
    """Build the plaintext forward: int32 [B, H, W, C] -> logits int32 [B, classes]."""

    def forward(x: jax.Array) -> jax.Array:
        x = x.astype(jnp.int32)
        for layer in model.layers:
            x = layer_forward_ptxt(layer, x)
        return x.reshape(x.shape[0], -1)

    return jax.jit(forward) if jit else forward


def predict(model: ModelPlan, images: np.ndarray, batch_size: int = 256) -> np.ndarray:
    """Run the model over converted-pixel images [N,H,W,C] -> predicted classes [N]."""
    fwd = build_forward(model)
    preds = []
    for i in range(0, len(images), batch_size):
        logits = np.asarray(fwd(jnp.asarray(images[i : i + batch_size])))
        preds.append(logits.argmax(axis=1))
    return np.concatenate(preds)
