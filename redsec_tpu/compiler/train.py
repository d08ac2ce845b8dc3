"""Margin-aware STE trainer for sign BNN topologies (the BYON train step).

The reference's BYON flow trains a Larq/TensorFlow twin emitted by
``compiler.py`` and converts ``var.dat1`` -> ``var_prep.dat`` offline
(/root/reference/compiler/README.md:29-53; training scripts e.g.
nets/cifar/binarynet/binarynet.py:38-62).  Larq/TF is not available here,
so this module IS the training leg of the toolchain: a minimal JAX trainer
with straight-through estimators whose hard-quantized forward is
bit-identical to this repo's plaintext engine after export — the whole
pipeline is  train -> export_var_dat1 -> weight_convert -> prep_model,
self-checked end to end (``train_and_export`` asserts the exported ptxt
predictions equal the trainer's own hard predictions).

Why margins are first-class: encrypted inference adds a FIXED mod-switch
noise (~7.6 message units at small_v2 geometry, PERFORMANCE.md) at every
sign bootstrap, while per-edge encoding gains multiply each boundary's
decision margins by ~budget/bound.  A network is noise-robust exactly when
every boundary's (margin x gain) clears that noise — so the loss shapes the
INTEGER pre-activation distribution directly: a hinge pushing |v| >= margin
and a cap keeping max|v| <= bound small enough that the gain stays large.
The shipped reference weights were never trained this way, which is why
their CIFAR agreement is margin-limited (~0.81 forecast ceiling,
PERFORMANCE.md round-3 analysis); this trainer is the positive control.

Supported topology family: Domain.BIN conv/fc layers with SIGN+BNORM (and
optional MaxPool), an optional leading INT passthrough/SumPool sign layer,
and a trailing FC_FINAL (Activation.NONE) — i.e. the mnist/sign* and
cifar/binarynet* families.  ReLU (DoReFa) nets are covered by the
staircase-STE twin in ``compiler/train_relu.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..models.spec import (
    Activation,
    BiasKind,
    ConvKind,
    Domain,
    ModelSpec,
    PoolKind,
)
from .weight_convert import BNORM_EPS, export_var_dat1, weight_convert


@dataclasses.dataclass
class TrainConfig:
    steps: int = 800
    lr: float = 2e-3
    margin: float = 6.0        # per-boundary integer-margin hinge target
    bound: float = 80.0        # soft cap on |v| (keeps encoding gains large)
    logit_margin: float = 24.0  # decrypt-boundary multi-class hinge
    lam_margin: float = 1.0
    lam_bound: float = 0.5
    input_sigma_units: float = 7.64  # mod-switch sigma for input-flip noise
    input_gain_est: float = 4.0      # assumed client-side input encoding gain
    hidden_noise: float = 1.0        # train-time noise on v (integer units)
    seed: int = 0
    log_every: int = 100
    # steps per jitted lax.scan segment (0 = plain python loop).  On the
    # tunneled TPU each dispatch costs ~1 s of round trip; scanning 50
    # steps per call amortizes it ~50x.
    scan_chunk: int = 0


def _ste_sign(v):
    """sign with straight-through gradient (pass-through inside |v|<=1)."""
    import jax
    import jax.numpy as jnp

    vc = jnp.clip(v, -1.0, 1.0)
    return vc + jax.lax.stop_gradient(jnp.where(v >= 0, 1.0, -1.0) - vc)


def _ste_tern(w, thresh: float):
    """Exact ternarizer of the weight converter (sign = f>0, zero = |f|<t,
    weight_convert.py:96-98) with clipped-identity gradient."""
    import jax
    import jax.numpy as jnp

    q = jnp.where(jnp.abs(w) < thresh, 0.0, jnp.where(w > 0, 1.0, -1.0))
    wc = jnp.clip(w, -1.0, 1.0)
    return wc + jax.lax.stop_gradient(q - wc)


def _layer_geometry(spec: ModelSpec):
    """Per-weight-layer geometry + the weight-converter's dim.scale
    recurrence (weight_convert.py:_convert_layer) for the supported
    sign-BNN family.  Returns (layers, scales) where layers is a list of
    dicts for Domain.BIN weight layers in order."""
    dim = spec.input_dims.copy()
    scale = float(dim.scale)
    h, w, c = dim.h, dim.w, dim.in_dep
    out: List[dict] = []
    for i, L in enumerate(spec.layers):
        if L.domain == Domain.INT:
            # leading passthrough/pool sign layer (no weights): INT branch
            # with shift_bits==1 sets scale=1.0 (weight_convert.py:180-185)
            assert L.conv == ConvKind.NONE and L.activation == Activation.SIGN, (
                "trainer supports only INT passthrough sign layers")
            if L.pool == PoolKind.SUM:
                pw = L.pool_params.window
                h, w = h // pw[0], w // pw[1]
                scale *= pw[0] * pw[1]
            scale = 1.0
            continue
        assert L.domain == Domain.BIN, "trainer supports sign BNNs only"
        g = {"index": i, "kind": L.conv, "thresh": L.conv_params.tern_thresh,
             "bnorm": L.bias == BiasKind.BNORM, "scale": scale,
             "maxpool": L.pool == PoolKind.MAX, "out": L.out_depth}
        if L.conv in (ConvKind.FC, ConvKind.FC_FINAL):
            g["shape"] = (1, 1, h * w * c, L.out_depth)
            h, w, c = 1, 1, L.out_depth
        else:
            assert L.conv_params.same_pad and L.conv_params.stride == (1, 1)
            g["shape"] = (L.conv_params.window[0], L.conv_params.window[1],
                          c, L.out_depth)
            c = L.out_depth
        if L.activation == Activation.SIGN:
            scale = 0.5  # BIN sign sets dim.scale=0.5 (weight_convert.py:162)
        else:
            assert L.conv == ConvKind.FC_FINAL and L.activation == Activation.NONE
        if g["maxpool"]:
            pw = L.pool_params.window
            h, w = h // pw[0], w // pw[1]
        out.append(g)
    return out


def init_params(spec: ModelSpec, seed: int = 0) -> List[Dict[str, np.ndarray]]:
    rng = np.random.default_rng(seed)
    params = []
    for g in _layer_geometry(spec):
        fan_in = g["shape"][0] * g["shape"][1] * g["shape"][2]
        w = rng.normal(0.0, 1.0 / np.sqrt(fan_in), size=g["shape"])
        # keep initial weights clear of the ternary dead zone so gradients
        # see the live quantizer from step 0
        w = np.where(np.abs(w) < 2 * g["thresh"],
                     np.sign(w + 1e-12) * 2 * g["thresh"], w)
        p = {"w": w.astype(np.float32)}
        if g["bnorm"]:
            p["beta"] = np.zeros(g["shape"][3], np.float32)
        params.append(p)
    return params


def build_twin(spec: ModelSpec):
    """Differentiable twin returning (logits, [per-boundary v_int])."""
    import jax
    import jax.numpy as jnp

    geom = _layer_geometry(spec)
    lead = spec.layers[0].domain == Domain.INT
    lead_pool = lead and spec.layers[0].pool == PoolKind.SUM
    pool_w = spec.layers[0].pool_params.window if lead_pool else None

    def forward(params, px, *, noise_rng=None, cfg: Optional[TrainConfig] = None):
        x = px.astype(jnp.float32)
        vs = []
        if lead_pool:
            B, H, W, C = x.shape
            x = x.reshape(B, H // pool_w[0], pool_w[0],
                          W // pool_w[1], pool_w[1], C).sum(axis=(2, 4))
        if lead:
            a = _ste_sign(x)
            if noise_rng is not None and cfg is not None:
                # train-time input-flip injection at the modeled rate
                # Phi(-g0 |x| / sigma): the encrypted input sign boundary
                # flips near-gray pixels, and downstream layers must learn
                # robustness to it (runtime/ranges.py noise model)
                from jax.scipy.stats import norm

                noise_rng, k = jax.random.split(noise_rng)
                p = norm.cdf(-cfg.input_gain_est * jnp.abs(x)
                             / cfg.input_sigma_units)
                flip = jax.random.bernoulli(k, p, a.shape)
                a = jax.lax.stop_gradient(
                    jnp.where(flip, -a, a) - a) + a
        else:
            a = x
        for g, p in zip(geom, params):
            wq = _ste_tern(p["w"], g["thresh"])
            if g["kind"] == ConvKind.CONV:
                s = jax.lax.conv_general_dilated(
                    a, wq, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            else:
                a2 = a.reshape(a.shape[0], -1)
                s = a2 @ wq.reshape(-1, g["shape"][3])
            if g["kind"] == ConvKind.FC_FINAL:
                return s, vs
            # batch norm on the integer sums (stats folded exactly at
            # export: bias_int = floor(scale * (-mean + beta * stddev)))
            mu = s.mean(axis=tuple(range(s.ndim - 1)))
            sd = jnp.sqrt(s.var(axis=tuple(range(s.ndim - 1))) + 1e-3)
            y = (s - mu) / sd + p["beta"]
            v = sd * y  # integer-domain pre-PBS value
            if noise_rng is not None and cfg is not None:
                noise_rng, k = jax.random.split(noise_rng)
                v = v + cfg.hidden_noise * jax.random.normal(k, v.shape)
                y = v / sd
            vs.append(v)
            a = _ste_sign(y)
            if g["maxpool"]:
                B, H, W, C = a.shape
                a = a.reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))
        raise AssertionError("model must end with FC_FINAL")

    return forward, geom


def export_trained(spec: ModelSpec, params, px: np.ndarray) -> bytes:
    """Export trained params as ``var.dat1`` bytes (the float dump the
    reference's weight-convert build reads; layout in weight_convert.py).

    BN statistics are frozen from a full-batch eval pass over ``px`` —
    deterministic, and exactly the statistics the training forward used on
    its final step (full-batch training)."""
    import jax.numpy as jnp

    forward, geom = build_twin(spec)

    # recompute per-layer mu/sd with a stats pass (hard forward, no noise)
    stats = []
    import jax

    def stats_pass(params, px):
        x = px.astype(jnp.float32)
        lead = spec.layers[0].domain == Domain.INT
        if lead and spec.layers[0].pool == PoolKind.SUM:
            pw = spec.layers[0].pool_params.window
            B, H, W, C = x.shape
            x = x.reshape(B, H // pw[0], pw[0], W // pw[1], pw[1], C).sum(axis=(2, 4))
        a = _ste_sign(x) if lead else x
        out = []
        for g, p in zip(geom, params):
            wq = _ste_tern(p["w"], g["thresh"])
            if g["kind"] == ConvKind.CONV:
                s = jax.lax.conv_general_dilated(
                    a, wq, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            else:
                s = a.reshape(a.shape[0], -1) @ wq.reshape(-1, g["shape"][3])
            if g["kind"] == ConvKind.FC_FINAL:
                return out
            mu = s.mean(axis=tuple(range(s.ndim - 1)))
            sd = jnp.sqrt(s.var(axis=tuple(range(s.ndim - 1))) + 1e-3)
            out.append((mu, sd))
            a = _ste_sign((s - mu) / sd + p["beta"])
            if g["maxpool"]:
                B, H, W, C = a.shape
                a = a.reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))
        raise AssertionError

    stats = [(np.asarray(m), np.asarray(s))
             for m, s in stats_pass(params, jnp.asarray(px))]

    arrays: List[np.ndarray] = []
    for j, (g, p) in enumerate(zip(geom, params)):
        arrays.append(np.asarray(p["w"], np.float32))
        if g["bnorm"]:
            mu, sd = stats[j]
            scale = g["scale"]
            # fold target: bias_int = scale*(-mean + beta*stddev) with
            # stddev = sqrt(var + BNORM_EPS)  (weight_convert.py:117-125);
            # we store mean/var in the twin's float units (= s / scale)
            arrays.append(np.asarray(p["beta"], np.float32))
            arrays.append((mu / scale).astype(np.float32))
            arrays.append(((sd / scale) ** 2 - BNORM_EPS).astype(np.float32))
    return export_var_dat1(arrays)


def train(spec: ModelSpec, px: np.ndarray, labels: np.ndarray,
          cfg: TrainConfig = TrainConfig(), params=None):
    """Full-batch margin-aware training.  Returns (params, history)."""
    import jax
    import jax.numpy as jnp
    import optax

    forward, geom = build_twin(spec)
    if params is None:
        params = init_params(spec, cfg.seed)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    x = jnp.asarray(px)
    y = jnp.asarray(labels)
    onehot = jax.nn.one_hot(y, geom[-1]["shape"][3])

    def loss_fn(params, rng):
        logits, vs = forward(params, x, noise_rng=rng, cfg=cfg)
        # multi-class integer-margin hinge at the decrypt boundary
        z_true = (logits * onehot).sum(-1)
        z_other = jnp.max(logits - 1e9 * onehot, axis=-1)
        l_cls = jnp.mean(jax.nn.relu(cfg.logit_margin - (z_true - z_other))
                         / cfg.logit_margin)
        l_m = sum(jnp.mean(jax.nn.relu(cfg.margin - jnp.abs(v)) / cfg.margin)
                  for v in vs) / len(vs)
        l_b = sum(jnp.mean(jax.nn.relu(jnp.abs(v) - cfg.bound) / cfg.bound)
                  for v in vs) / len(vs)
        return l_cls + cfg.lam_margin * l_m + cfg.lam_bound * l_b, (logits, vs)

    opt = optax.adam(cfg.lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, rng):
        (l, (logits, vs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, rng)
        updates, state = opt.update(grads, state)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean((logits.argmax(-1) == y).astype(jnp.float32))
        min_m = jnp.stack([jnp.abs(v).min() for v in vs]).min()
        return params, state, l, acc, min_m

    @jax.jit
    def multi_step(params, state, rng):
        def body(carry, k):
            params, state = carry
            (l, (logits, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, k)
            updates, state = opt.update(grads, state)
            params = optax.apply_updates(params, updates)
            acc = jnp.mean((logits.argmax(-1) == y).astype(jnp.float32))
            return (params, state), (l, acc)

        keys = jax.random.split(rng, cfg.scan_chunk)
        (params, state), (ls, accs) = jax.lax.scan(body, (params, state), keys)
        return params, state, ls[-1], accs[-1]

    rng = jax.random.PRNGKey(cfg.seed)
    hist = []
    if cfg.scan_chunk > 1:
        for i in range(0, cfg.steps, cfg.scan_chunk):
            rng, k = jax.random.split(rng)
            params, state, l, acc = multi_step(params, state, k)
            rec = (i + cfg.scan_chunk - 1, float(l), float(acc), -1.0)
            hist.append(rec)
            print(f"step {rec[0]:5d} loss {rec[1]:.4f} "
                  f"train_acc {rec[2]:.3f}", flush=True)
    else:
        for i in range(cfg.steps):
            rng, k = jax.random.split(rng)
            params, state, l, acc, min_m = step(params, state, k)
            if i % cfg.log_every == 0 or i == cfg.steps - 1:
                rec = (i, float(l), float(acc), float(min_m))
                hist.append(rec)
                print(f"step {rec[0]:5d} loss {rec[1]:.4f} "
                      f"train_acc {rec[2]:.3f} min|v| {rec[3]:.1f}",
                      flush=True)
    return jax.tree_util.tree_map(np.asarray, params), hist


def train_and_export(spec: ModelSpec, px: np.ndarray, labels: np.ndarray,
                     cfg: TrainConfig = TrainConfig()
                     ) -> Tuple[bytes, bytes, dict]:
    """Train, export var.dat1, weight-convert, and SELF-CHECK: the exported
    ptxt pipeline must predict exactly what the trainer's hard forward
    predicts on the training rows.  Returns (var_dat1, var_prep, report)."""
    import jax.numpy as jnp

    from ..models.spec import prep_model
    from ..runtime.ptxt import build_forward

    params, hist = train(spec, px, labels, cfg)
    raw = export_trained(spec, params, px)
    prep = weight_convert(spec, raw)

    forward, _ = build_twin(spec)
    logits, vs = forward(params, jnp.asarray(px))
    twin_preds = np.asarray(logits).argmax(-1)

    plan = prep_model(spec, prep)
    ptxt_logits = np.asarray(build_forward(plan)(jnp.asarray(px)))
    ptxt_preds = ptxt_logits.argmax(-1)
    agree = float((twin_preds == ptxt_preds).mean())
    report = {
        "train_acc_twin": float((twin_preds == labels).mean()),
        "train_acc_ptxt": float((ptxt_preds == labels).mean()),
        "twin_vs_ptxt_agreement": agree,
        "min_abs_margin": [float(np.abs(np.asarray(v)).min()) for v in vs],
        "max_abs_bound": [float(np.abs(np.asarray(v)).max()) for v in vs],
        "history": hist,
    }
    return raw, prep, report
