"""Certified activation-range analysis for PBS validity guards.

Every programmable bootstrap has a domain of validity on its input phase:

- sign / maxpool-OR:        |v| < msg_space/2   (anti-periodic test vector)
- relu, quarter-range:      |v| < msg_space/4   (half-torus trick, 1 PBS)
- relu, full-range (FDFB):  |v| < msg_space/2   (odd/even split, 3 PBS)

The reference never checks this: its leveled accumulation silently wraps
beyond the 4096 message space (lib/BinFunc.cpp:166) and relies on BNN
statistics to stay inside.  Its tracked ``up_bound`` (lib/Layer.h:113-127)
is bit-width bookkeeping, not a sound value bound (it is off by 2x in both
directions on the shipped nets).  We instead compute a CERTIFIED per-channel
interval from the actual ternary weights (exact interval arithmetic), and
optionally a measured bound from a calibration run of the plaintext oracle
(``calibrate_ranges``); ``resolve_pbs_ranges`` picks the relu implementation
per layer and fails loudly when no implementation is valid.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..models.spec import Activation, LayerPlan, ModelPlan


@dataclasses.dataclass
class PbsRange:
    """Range facts for one layer's PBS boundary (None when the layer has no
    bootstrap, i.e. a pure add-bias layer)."""

    certified: Optional[int]  # sound bound on |pre-PBS value| incl. bias
    measured: Optional[int]  # from calibrate_ranges, if run
    relu_mode: Optional[str] = None  # "quarter" | "full" for RELU layers
    # Per-edge encoding gains (encrypted domain only; powers of two).  The
    # layer's inputs arrive scaled by in_gain and its activations leave
    # scaled by out_gain, so the NEXT bootstrap's decision margins grow
    # out_gain x while the mod-switch noise (fixed in absolute units,
    # PERFORMANCE.md) does not.  The reference cannot do this: its message
    # encoding is hardwired to +-1 (lib/BinOps_enc.cpp:182-186).
    in_gain: int = 1
    out_gain: int = 1
    # Per-channel re-encoding shift [C] (ungained units) applied to the
    # ciphertext before this layer's PBS, folded back out by the test
    # vectors: centers an asymmetric pre-activation range so the budget
    # covers (hi-lo)/2 instead of max(|lo|,|hi|).  RELU layers only (a sign
    # boundary is pinned at 0 and cannot shift).
    center: Optional[np.ndarray] = None

    def effective(self) -> Optional[int]:
        return self.measured if self.measured is not None else self.certified

    def scaled(self) -> Optional[int]:
        b = self.effective()
        return None if b is None else b * self.in_gain


def _conv_interval(plan, lo: np.ndarray, hi: np.ndarray):
    """Per-output-channel interval of a ternary conv/fc given per-input-channel
    input intervals.  Padding taps contribute exact zeros, so the input
    interval is first widened to include 0 when the conv pads."""
    w = plan.weights.astype(np.int64)  # [wh, ww, cin, cout]
    if plan.offset != (0, 0):
        lo, hi = np.minimum(lo, 0), np.maximum(hi, 0)
    wp = np.maximum(w, 0).sum(axis=(0, 1))  # [cin, cout]
    wn = np.maximum(-w, 0).sum(axis=(0, 1))
    out_lo = lo @ wp - hi @ wn
    out_hi = hi @ wp - lo @ wn
    if plan.neg_correction is not None:
        out_lo = out_lo - plan.neg_correction
        out_hi = out_hi - plan.neg_correction
    return out_lo, out_hi


def _maxpool_bound(layer: LayerPlan, msg_space: int) -> int:
    """Worst |pre| of the window-OR bootstrap: all-true window of +-V signs
    plus the (count-1)V bias = (2w-1)V < msg_space/2 by construction of
    V = msg_space/(4w) (ops/encrypted.py:maxpool_sign_value)."""
    w = layer.maxpool.window[0] * layer.maxpool.window[1]
    v = max(1, msg_space // (4 * w))
    return (2 * w - 1) * v


def _layer_intervals(layer: LayerPlan, lo: np.ndarray, hi: np.ndarray):
    """Propagate per-channel intervals through one layer; returns
    (pre_pbs_bound or None, out_lo, out_hi)."""
    if layer.conv is not None:
        if layer.conv.flatten:
            reps = layer.conv.in_dep // lo.shape[0]
            lo, hi = np.tile(lo, reps), np.tile(hi, reps)
        lo, hi = _conv_interval(layer.conv, lo, hi)
    if layer.sumpool is not None:
        area = layer.sumpool.window[0] * layer.sumpool.window[1]
        lo, hi = lo * area, hi * area

    q = layer.quant
    bound: Optional[int] = None
    if q.mode == Activation.SIGN:
        b = q.bias.astype(np.int64)
        bound = int(np.maximum(np.abs(lo + b), np.abs(hi + b)).max())
        lo = np.full(q.depth, -1, np.int64)
        hi = np.ones(q.depth, np.int64)
    elif q.mode == Activation.RELU:
        # relu's bias folds into the test vector; the ciphertext input is the
        # raw accumulated value (ops/encrypted.py relu_test_vectors)
        bound = int(np.maximum(np.abs(lo), np.abs(hi)).max())
        top = (1 << q.shift_bits) - 1
        lo = np.zeros(q.depth, np.int64)
        hi = np.full(q.depth, top, np.int64)
    else:  # NONE: leveled bias add only, no bootstrap; bound still
        # matters (decrypt range / downstream gain selection)
        b = q.bias.astype(np.int64)
        lo, hi = lo + b, hi + b
        bound = int(np.maximum(np.abs(lo), np.abs(hi)).max())

    # maxpool's OR bootstrap bound is safe by construction and accounted in
    # resolve_pbs_ranges via _maxpool_bound (it needs msg_space)
    return bound, lo, hi


def certified_pbs_bounds(model: ModelPlan) -> List[Optional[int]]:
    """Sound per-layer bounds on |pre-PBS value| entering the QUANT
    bootstrap, from exact interval arithmetic over the loaded weights
    (None for bootstrap-free layers).  Maxpool OR bounds are handled
    separately (safe by construction, _maxpool_bound)."""
    b0 = int(model.in_dim.up_bound)
    lo = np.full(model.in_dim.in_dep, -b0, np.int64)
    hi = np.full(model.in_dim.in_dep, b0, np.int64)
    out = []
    for layer in model.layers:
        bound, lo, hi = _layer_intervals(layer, lo, hi)
        out.append(bound)
    return out


def calibrate_ranges(model: ModelPlan, images: np.ndarray) -> List[Optional[int]]:
    """Measure actual max |pre-PBS value| per layer by running the plaintext
    oracle over a calibration set; stores the result on each LayerPlan
    (``measured_pre_bound``) so later ``build_encrypted_forward`` calls pick
    it up.  Mirrors the reference's implicit contract: its 4096 leveled
    budget is validated only by observed BNN statistics (REDsec paper §IV)."""
    import jax.numpy as jnp

    from . import ptxt as rp

    x = jnp.asarray(np.asarray(images, np.int32))
    bounds: List[Optional[int]] = []
    for layer in model.layers:
        pre = x
        if layer.conv is not None:
            pre = rp.conv_ptxt(layer.conv, pre)
        if layer.sumpool is not None:
            pre = rp.sumpool_ptxt(layer.sumpool, pre)
        q = layer.quant
        bound = None
        if q.mode == Activation.SIGN or q.mode == Activation.NONE:
            b = np.asarray(pre) + q.bias.reshape(1, 1, 1, -1)
            bound = int(np.abs(b).max())
        elif q.mode == Activation.RELU:
            a = np.asarray(pre)
            bound = int(np.abs(a).max())
            layer.measured_chan_interval = (
                a.min(axis=(0, 1, 2)).astype(np.int64),
                a.max(axis=(0, 1, 2)).astype(np.int64),
            )
        layer.measured_pre_bound = bound
        bounds.append(bound)
        x = rp.layer_forward_ptxt(layer, x)
    return bounds


def resolve_pbs_ranges(
    model: ModelPlan, msg_space: int, strict: bool = True,
    gains: bool = True, gain_headroom: float = 2.0,
    input_gain: bool = False,
) -> Dict[int, PbsRange]:
    """Pick the relu implementation, per-edge encoding gains, and guard
    every PBS boundary.

    Returns {layer_index: PbsRange}.  Raises ValueError when a scaled bound
    exceeds the widest valid domain (msg_space/2) and ``strict``; with
    strict=False the widest implementation is used anyway (the same
    silent-wrap behavior the reference always has, lib/BinFunc.cpp:166).

    Gains: each activation layer's output encoding is scaled by the largest
    power of two keeping the NEXT layer's bound within
    msg_space/2 / gain_headroom.  The mod-switch noise that dominates
    end-to-end accuracy (~sqrt(n/24) rotation slots, PERFORMANCE.md) is
    fixed in absolute message units, so a gain of g multiplies every sign /
    relu decision margin by g at zero extra bootstraps.  Measured on
    sign1024x1: 59% of hidden-layer pre-activations sit within +-1 sigma of
    the boundary at unit encoding; at g=8 almost none do.  Gains need
    calibrated or tight certified bounds — with only loose worst-case
    bounds they stay 1 and behavior is unchanged."""
    certified = certified_pbs_bounds(model)
    out: Dict[int, PbsRange] = {}
    quarter, half = msg_space // 4, msg_space // 2
    ranges = []
    for i, layer in enumerate(model.layers):
        r = PbsRange(certified=certified[i], measured=layer.measured_pre_bound)
        ranges.append(r)
        out[i] = r

    # Per-channel centering for relu layers (REDSEC_CENTER=0 disables): the
    # staircase is translation-foldable (unlike sign's pinned boundary), so
    # an asymmetric calibrated range [lo, hi] re-encodes as +-(hi-lo)/2 via
    # an exact noiseless shift — this is what makes relu1024x3 (|v|max 2690
    # at 100 images, beyond the +-2048 budget) runnable at all, and roughly
    # doubles the gain budget on the other relu edges.  The reference has no
    # analogue: its relu chain wraps silently (lib/IntFunc.cpp:860-973).
    if os.environ.get("REDSEC_CENTER", "1") != "0":
        for i, layer in enumerate(model.layers):
            if (layer.quant.mode == Activation.RELU
                    and layer.measured_chan_interval is not None):
                lo, hi = layer.measured_chan_interval
                s = -((lo + hi) // 2)
                # align shifts to the 2N rotation grid (msg_space/2N units,
                # = 2 for every shipped set): a sub-slot phase shift would
                # change mod-switch rounding vs the uncentered grid and
                # break the exact tv fold (tests/test_noise_sim.py)
                s = s - (s % 2)
                if np.any(s != 0):
                    ranges[i].center = s.astype(np.int64)
                    ranges[i].measured = int(
                        np.maximum(np.abs(lo + s), np.abs(hi + s)).max())

    if gains:
        # choose out_gain of layer i from the bound of layer i+1 (whose
        # inputs are layer i's activations); bounds are linear in in_gain
        budget = half / gain_headroom
        if input_gain:
            # model-INPUT encoding gain: the client encrypts pixels scaled by
            # g0 (public metadata, exact re-encoding), multiplying the first
            # bootstrap's decision margins by g0 — reaches the edge no
            # layer-side gain can (the pixel edge has no bootstrap to
            # re-encode at).  Callers must scale the encrypted pixels by
            # info[0].in_gain (runtime.encrypted forward exposes it).
            # the gain propagates through leading bias-only layers to the
            # first PBS; that layer's bound is the constraint
            k = next(
                (j for j, L in enumerate(model.layers)
                 if L.quant.mode != Activation.NONE or L.maxpool is not None),
                None)
            b0 = ranges[k].effective() if k is not None else None
            if b0 and b0 > 0:
                g = 1
                while b0 * (g * 2) <= budget:
                    g *= 2
                ranges[0].in_gain = g
        for i in range(len(model.layers) - 1):
            q = model.layers[i].quant
            if q.mode == Activation.NONE and model.layers[i].maxpool is None:
                continue  # bootstrap-free layer: encoding passes through
            nxt = ranges[i + 1].effective()
            # the final bias-only layer has no bootstrap but its decrypt
            # range must stay inside the message space too
            if nxt is None or nxt <= 0:
                continue
            g = 1
            while nxt * (g * 2) <= budget:
                g *= 2
            ranges[i].out_gain = g
            ranges[i + 1].in_gain = g
        # bootstrap-free (bias-only) layers don't re-encode: their outputs
        # carry the input gain through (the final scores' out_gain)
        for i, layer in enumerate(model.layers):
            q = layer.quant
            if q.mode == Activation.NONE and layer.maxpool is None:
                ranges[i].out_gain = ranges[i].in_gain
                if i + 1 < len(model.layers):
                    ranges[i + 1].in_gain = ranges[i].out_gain

    for i, layer in enumerate(model.layers):
        r = ranges[i]
        q = layer.quant
        eff = r.scaled()
        if q.mode == Activation.RELU:
            # REDSEC_RELU_MODE=full forces FDFB everywhere: 3x the relu PBS
            # cost, but disagreements from mod-switch noise near the
            # quarter-range seam disappear (relu1024x1: 0.94 -> ~1.0 oracle
            # agreement, PERFORMANCE.md round-2 table)
            forced = os.environ.get("REDSEC_RELU_MODE", "")
            if forced in ("quarter", "full"):
                r.relu_mode = forced
            else:
                r.relu_mode = (
                    "quarter" if (eff is not None and eff < quarter) else "full"
                )
        if eff is not None and eff >= half and (
            q.mode == Activation.RELU or q.mode == Activation.SIGN
        ):
            msg = (
                f"layer {i} ({model.spec.name}): pre-bootstrap bound {eff} "
                f"(x{r.in_gain} encoding gain) exceeds the message-space "
                f"budget +-{half} "
                f"({'measured' if r.measured is not None else 'certified worst-case'}); "
                f"run runtime.ranges.calibrate_ranges for a data-driven bound, "
                f"use a larger msg_space parameter set, or pass "
                f"range_check=False to accept reference-style silent wrapping"
            )
            if strict:
                raise ValueError(msg)
    return out
