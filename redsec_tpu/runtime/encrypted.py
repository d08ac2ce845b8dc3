"""Encrypted execution engine: run a prepped model over LWE ciphertext tensors.

The cloud side of the reference's ``make cpu-encrypt`` flow
(nets/mnist/sign1024x1/net.cpp:117-131): evaluation key in, encrypted image
in, encrypted class scores out.  All layers of a model run inside jit; the
only data-dependent sizes are resolved at trace time from the ModelPlan.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.bootstrap import DeviceCloudKey, make_chunked_impl
from ..models.spec import Activation, ModelPlan
from ..ops import encrypted as eops
from .ranges import resolve_pbs_ranges


def _resolve_info(model: ModelPlan, params, range_check: bool = True):
    """Per-layer PbsRange info: relu implementation ("quarter" 1-PBS |
    "full" 3-PBS FDFB), per-edge encoding gains, per-channel relu centering,
    and the loud range guard (runtime/ranges.py).

    REDSEC_INPUT_GAIN=1 additionally assigns a model-input encoding gain
    (client encrypts pixels scaled by forward.in_gain) — env-driven so the
    encrypt side and every forward builder resolve the same assignment."""
    return resolve_pbs_ranges(
        model, params.msg_space, strict=range_check,
        input_gain=os.environ.get("REDSEC_INPUT_GAIN", "0") == "1",
        sigma_units=params.mod_switch_sigma_units())


def model_out_center(info):
    """Per-class decrypt-centering shift of the final layer (ungained
    units), or None — public metadata the decryptor subtracts
    (runtime/ranges.py final-layer centering)."""
    r = info[max(info)]
    return getattr(r, "center", None)


def model_out_gain(info) -> int:
    """Encoding gain carried by the final class scores (divide decrypted
    scores by this; argmax is invariant to it)."""
    return info[max(info)].out_gain


def model_in_gain(info) -> int:
    """Encoding gain expected on the model-INPUT ciphertexts: the client
    must encrypt pixels scaled by this (resolve_pbs_ranges(input_gain=True)
    assigns it; 1 otherwise).  Exposed as forward.in_gain."""
    return info[0].in_gain if 0 in info else 1


def majority_config() -> tuple[int, int]:
    """(k, from_layer) for the re-randomized majority-voted PBS
    (ops/encrypted.py:majority_pbs).  REDSEC_MAJORITY=k (odd, default 1 =
    off) engages voting on every sign-type boundary whose layer index is
    >= REDSEC_MAJORITY_FROM (default 0) at a (k+1)x bootstrap cost there."""
    k = int(os.environ.get("REDSEC_MAJORITY", "1"))
    if k > 1 and k % 2 == 0:
        raise ValueError(f"REDSEC_MAJORITY must be odd (ties), got {k}")
    return k, int(os.environ.get("REDSEC_MAJORITY_FROM", "0"))


def majority_k_for_layer(i: int) -> int:
    """Vote count for layer i's sign-type boundary.

    REDSEC_MAJORITY_PLAN="5:5,7:7" overrides the global REDSEC_MAJORITY per
    layer index — the cascade-aware shape: a LARGE k on a small deep
    boundary that feeds a huge fan-in (e.g. the CIFAR nets' 4k-activation
    maxpool before the FC-4096 layer) buys quadratic flip suppression at the
    cascade's source for a negligible share of total bootstraps, while the
    bulky early conv layers stay at the cheap k."""
    plan = os.environ.get("REDSEC_MAJORITY_PLAN", "")
    k, frm = majority_config()
    kk = k if i >= frm else 1
    if plan:
        for item in plan.split(","):
            li, _, lk = item.partition(":")
            if li.strip() and int(li) == i:
                kk = int(lk)
    if kk > 1 and kk % 2 == 0:
        raise ValueError(f"majority k must be odd (ties), got {kk} @ layer {i}")
    return kk


def _majority_wrap(pbs_fn, params, rerand, i):
    """pbs_fn' that majority-votes sign-type boundaries of layer i (per
    majority_config); identity wrapper when voting is off or out of range."""
    k = majority_k_for_layer(i)
    if k < 2:
        return pbs_fn
    if rerand is None:
        raise ValueError(
            "REDSEC_MAJORITY needs a re-randomization pool on the cloud key "
            "(keygen now always emits CloudKey.rerand; re-generate or "
            "re-save keys produced before it existed)")

    def voted(ct, tv):
        return eops.majority_pbs(pbs_fn, ct, tv, params, k, rerand, salt=i)

    return voted


def _run_layer_ops(layer, x, pbs_fn, params, r, i=0, rerand=None):
    """Conv/pool/quant/maxpool for one layer, with r: PbsRange gains."""
    if layer.conv is not None:
        x = eops.conv_enc(layer.conv, x, params.msg_space, r.in_gain)
    if layer.sumpool is not None:
        x = eops.sumpool_enc(layer.sumpool, x)
    q = layer.quant
    vote_fn = _majority_wrap(pbs_fn, params, rerand, i)
    if q.mode == Activation.SIGN:
        # a maxpool-feeding sign outputs +-V so the window-OR margin dwarfs
        # the mod-switch noise (ops/encrypted.py:maxpool_sign_value)
        ov = (eops.maxpool_sign_value(layer.maxpool, params)
              if layer.maxpool is not None else r.out_gain)
        x = eops.quant_sign_enc(q, x, vote_fn, params, ov, r.in_gain,
                                r.tie_break)
    elif q.mode == Activation.NONE:
        x = eops.quant_add_bias_enc(q, x, params, r.in_gain, r.center)
    elif r.relu_mode == "quarter":
        x = eops.quant_relu_enc(q, x, pbs_fn, params, r.in_gain, r.out_gain,
                                r.center)
    else:
        x = eops.quant_relu_fdfb_enc(q, x, pbs_fn, params, r.in_gain,
                                     r.out_gain, r.center)
    if layer.maxpool is not None:
        x = eops.maxpool_enc(layer.maxpool, x, vote_fn, params, r.out_gain)
    return x


def build_layer_impls(model: ModelPlan, params, plan, pbs_chunk: int = 512,
                      info=None, bundle: int = 1, rerand=None):
    """Per-layer un-jitted forwards ``impl(bk_ntt, ksk_limbs, x) -> x'``.
    The caller is responsible for the final reshape to [B, classes, n+1].
    Lets callers jit layer-by-layer: large nets (CIFAR) as a single
    whole-model HLO can exceed what a remote compile service accepts.
    """
    pbs_impl = make_chunked_impl(params, plan, chunk=pbs_chunk, bundle=bundle)
    if info is None:
        info = _resolve_info(model, params)

    def mk(i, layer):
        def run(bk_ntt, ksk_limbs, x):
            def pbs_fn(ct, tv):
                return pbs_impl(bk_ntt, ksk_limbs, ct, tv)

            return _run_layer_ops(layer, x, pbs_fn, params, info[i],
                                  i, rerand)

        return run

    return [mk(i, layer) for i, layer in enumerate(model.layers)]


def build_forward_impl(
    model: ModelPlan, params, plan, pbs_chunk: int = 512, info=None,
    bundle: int = 1, rerand=None,
) -> Callable:
    """Un-jitted encrypted forward taking the evaluation key as arguments:
    ``impl(bk_ntt, ksk_limbs, x [B,H,W,C,n+1]) -> [B, classes, n+1]``.

    Keys must be runtime arguments, not closure constants — constants embed
    the ~330 MB key into the serialized HLO (see crypto/bootstrap.py).
    (The ~90 KB re-randomization pool IS closed over: far below the limit.)
    """
    pbs_impl = make_chunked_impl(params, plan, chunk=pbs_chunk, bundle=bundle)
    if info is None:
        info = _resolve_info(model, params)

    def forward(bk_ntt, ksk_limbs, x: jax.Array) -> jax.Array:
        def pbs_fn(ct, tv):
            return pbs_impl(bk_ntt, ksk_limbs, ct, tv)

        for i, layer in enumerate(model.layers):
            x = _run_layer_ops(layer, x, pbs_fn, params, info[i], i, rerand)
        return x.reshape(x.shape[0], -1, x.shape[-1])

    forward.out_gain = model_out_gain(info)
    forward.out_center = model_out_center(info)
    forward.in_gain = model_in_gain(info)
    return forward


def escalation_config() -> tuple[set, str]:
    """(layer set, params name) for per-boundary parameter escalation.

    REDSEC_ESCALATE="6,7" routes those layers' PBS boundaries (sign,
    maxpool-OR, relu quarter/FDFB)
    through a SECOND prepared cloud key at REDSEC_ESCALATE_PARAMS geometry
    (default small_v2_n2048: same n=350 LWE dimension and 4096 message
    space, but N=2048 — half the mod-switch sigma).  Same-seed keygen draws
    the identical client LWE key for both sets, so ciphertexts are
    interchangeable between the two keys' bootstraps; only the boundaries
    whose margins are sub-noise pay the ~7.5x slower big-N bootstrap.  No
    reference analogue (its parameter set is fixed per build,
    client/gen_secure_keyset.cpp:94-97)."""
    spec = os.environ.get("REDSEC_ESCALATE", "")
    layers = {int(s) for s in spec.split(",") if s.strip()}
    return layers, os.environ.get("REDSEC_ESCALATE_PARAMS", "small_v2_n2048")


def build_staged_forward(
    model: ModelPlan, dkey: DeviceCloudKey, pbs_chunk: int = 512,
    pbs_macro: int = 16384, info=None, escalate=None,
) -> Callable[[jax.Array], jax.Array]:
    """Encrypted forward with HOST-level PBS macro-batching.

    Each layer's leveled prefix (conv/pool/bias, up to the PBS boundary) is
    its own jitted program; the bootstraps then run as a host loop of
    <= ``pbs_macro``-sized jitted chunked-PBS dispatches. Required for nets
    whose single-layer activation counts exceed what one device program can
    hold on this backend (CIFAR conv layers: 65k+ bootstraps — the worker
    crashes above ~32k per program); also keeps every compiled program small.

    ``escalate``: optional ``(layer_set, DeviceCloudKey)`` routing those
    layers' sign-type PBS through the second key (see escalation_config).
    """
    from ..crypto.bootstrap import _key_material, make_chunked_impl

    params, plan = dkey.params, dkey.plan
    if info is None:
        info = _resolve_info(model, params)

    def _make_pbs_host(dk, macro):
        impl = jax.jit(make_chunked_impl(dk.params, dk.plan, chunk=pbs_chunk,
                                         bundle=dk.bundle))
        karg = _key_material(dk)
        N = dk.params.N

        def pbs_host(ct, tv):
            m = ct.shape[0]
            if m <= macro:
                return impl(karg, dk.ksk_limbs, ct, tv)
            tv_full = jnp.broadcast_to(
                jnp.asarray(tv, jnp.int32).reshape(-1, N), (m, N))
            outs = []
            for i0 in range(0, m, macro):
                sl = ct[i0 : i0 + macro]
                tl = tv_full[i0 : i0 + macro]
                pad = macro - sl.shape[0]
                if pad:
                    sl = jnp.concatenate(
                        [sl, jnp.zeros((pad, sl.shape[1]), sl.dtype)])
                    tl = jnp.concatenate([tl, jnp.zeros((pad, N), tl.dtype)])
                outs.append(impl(karg, dk.ksk_limbs, sl, tl)[: m - i0])
            return jnp.concatenate(outs, axis=0)

        return pbs_host

    pbs_host = _make_pbs_host(dkey, pbs_macro)
    esc_layers, esc_host = set(), None
    if escalate is not None:
        esc_layers, dkey2 = escalate
        if dkey2.params.msg_space != params.msg_space:
            raise ValueError("escalation keys must share the message space")
        # big-N programs hit the worker's working-set ceiling sooner: cap
        # the macro so batch x N stays at the measured-safe envelope
        macro2 = min(pbs_macro, 4096 * 1024 // dkey2.params.N * 2)
        esc_host = _make_pbs_host(dkey2, macro2)

    def _params_for(i):
        return dkey2.params if i in esc_layers else params

    def _host_for(i):
        return esc_host if i in esc_layers else pbs_host

    def _pre_conv(i, layer):
        r = info[i]

        def run(x):
            if layer.conv is not None:
                x = eops.conv_enc(layer.conv, x, params.msg_space, r.in_gain)
            if layer.sumpool is not None:
                x = eops.sumpool_enc(layer.sumpool, x)
            q = layer.quant
            if q.mode == Activation.SIGN:
                ov = (eops.maxpool_sign_value(layer.maxpool, params)
                      if layer.maxpool is not None else r.out_gain)
                ct, tv = eops.quant_sign_pre(q, x, _params_for(i), ov,
                                             r.in_gain, r.tie_break)
                return ct, tv, x.shape
            if q.mode == Activation.NONE:
                x = eops.quant_add_bias_enc(q, x, params, r.in_gain, r.center)
                return x, None, x.shape
            if r.relu_mode == "quarter":
                ct, tv = eops.quant_relu_pre(q, x, _params_for(i), r.in_gain,
                                             r.out_gain, r.center)
                return ct, tv, x.shape
            # FDFB stage 1: flat (centered) cts + sign tv; forward runs 2/3
            ct, tv = eops.quant_relu_fdfb_stage1(q, x, _params_for(i),
                                                 r.in_gain, r.center)
            return ct, tv, x.shape

        return run

    pre_fns = [jax.jit(_pre_conv(i, layer))
               for i, layer in enumerate(model.layers)]
    fdfb_fns = {
        i: jax.jit(lambda flat, s, q=layer.quant, r=info[i], pp=_params_for(i):
                   eops.quant_relu_fdfb_stage2(q, flat, s, pp,
                                               r.in_gain, r.out_gain,
                                               r.center))
        for i, layer in enumerate(model.layers)
        if layer.quant.mode == Activation.RELU and info[i].relu_mode == "full"
    }
    mpre_fns = {
        i: jax.jit(lambda x, l=layer, r=info[i], pp=_params_for(i):
                   eops.maxpool_pre(l.maxpool, x, pp, r.out_gain))
        for i, layer in enumerate(model.layers) if layer.maxpool is not None
    }

    # majority-voted sign boundaries (REDSEC_MAJORITY / _PLAN): jitted
    # stage-1 replicate / vote-sum glue around two pbs_host dispatches per
    # boundary; one jitted pair per distinct k in the per-layer plan
    maj_ks = {i: majority_k_for_layer(i) for i in range(len(model.layers))}
    if max(maj_ks.values(), default=1) > 1 and dkey.rerand is None:
        raise ValueError(
            "REDSEC_MAJORITY needs a re-randomization pool on the cloud key "
            "(keygen now always emits CloudKey.rerand)")
    # stage-1 builders are keyed per LAYER: the vote test vector must match
    # the geometry of the key the votes run through (escalated layers vote
    # at the big-N geometry)
    stage1_fns = {
        i: jax.jit(lambda ct, salt, k=k, pp=_params_for(i):
                   eops.majority_stage1_pre(ct, pp, k, dkey.rerand, salt),
                   static_argnums=1)
        for i, k in maj_ks.items() if k > 1}
    vote_sum_fns = {
        k: jax.jit(lambda v, k=k: eops.majority_vote_sum(v, k))
        for k in sorted(set(maj_ks.values())) if k > 1}

    def pbs_sign(ct_flat, tv, i):
        """Sign-type boundary dispatch: plain PBS, or (k stage-1 votes ->
        leveled majority -> stage-2 PBS) when voting is engaged; escalated
        layers route every read through the big-N key."""
        host = _host_for(i)
        k = maj_ks[i]
        if k < 2:
            return host(ct_flat, tv)
        copies, tv1 = stage1_fns[i](ct_flat, i)
        votes = host(copies, tv1)
        return host(vote_sum_fns[k](votes), tv)

    def forward(x: jax.Array) -> jax.Array:
        for i, layer in enumerate(model.layers):
            ct, tv, shape = pre_fns[i](x)
            if tv is None:
                x = ct
            elif i in fdfb_fns:
                host = _host_for(i)
                flat = ct  # already [m, n+1] from stage 1
                s = host(flat, tv)  # sign bootstrap (+-msize/4)
                ct2, tvs_o, tvs_e, c_flat = fdfb_fns[i](flat, s)
                out = host(flat, tvs_o) + host(ct2, tvs_e)
                x = out.at[:, -1].add(c_flat).reshape(shape)
            elif layer.quant.mode == Activation.SIGN:
                x = pbs_sign(ct.reshape(-1, ct.shape[-1]), tv, i).reshape(shape)
            else:
                # pbs expects flat [m, n+1]; reshape back to the layer shape
                x = _host_for(i)(
                    ct.reshape(-1, ct.shape[-1]), tv).reshape(shape)
            if layer.maxpool is not None:
                ct, tv = mpre_fns[i](x)
                mshape = ct.shape
                x = pbs_sign(ct.reshape(-1, ct.shape[-1]), tv, i).reshape(mshape)
        return x.reshape(x.shape[0], -1, x.shape[-1])

    return forward


def build_encrypted_forward(
    model: ModelPlan, dkey: DeviceCloudKey, jit="auto", pbs_chunk: int = 512,
    pbs_macro: int = 16384, range_check: bool = True, escalate=None,
) -> Callable[[jax.Array], jax.Array]:
    """Encrypted forward bound to a device key:
    int32 [B, H, W, C, n+1] -> [B, classes, n+1].

    ``jit``: True = one whole-model program; "layer" = one program per layer;
    "staged" = per-layer leveled programs + host-macro-batched PBS (for nets
    with huge per-layer bootstrap counts); "auto" picks by model size;
    False = eager.

    ``range_check``: every PBS boundary's input bound (measured via
    runtime.ranges.calibrate_ranges when available, else certified interval
    arithmetic) must fit the message-space budget; violations raise at build
    time instead of silently wrapping like the reference (runtime/ranges.py).
    Relu layers pick the 1-PBS quarter-range or 3-PBS full-range (FDFB)
    implementation from the same bounds.
    """
    from ..crypto.bootstrap import _key_material

    info = _resolve_info(model, dkey.params, range_check)
    impl = build_forward_impl(model, dkey.params, dkey.plan, pbs_chunk, info,
                              bundle=dkey.bundle, rerand=dkey.rerand)

    from ..utils.metrics import summarize

    stats = summarize(model)
    per_image = {
        "total": stats.get("total_bootstraps", 0),
        "biggest": max((s.get("bootstraps", 0)
                        for s in stats.get("layers", [])), default=0),
    }
    maj_max = max((majority_k_for_layer(i)
                   for i in range(len(model.layers))), default=1)
    if maj_max > 1:
        # voted sign boundaries run k+1 bootstraps per activation; scale the
        # program-size estimates conservatively (relu boundaries don't vote)
        per_image = {k2: v * (maj_max + 1) for k2, v in per_image.items()}
    if escalate is not None and jit != "staged":
        # the second key's dispatch lives in the staged host loop only
        jit = "staged"
    if jit == "auto":
        # the per-program bootstrap ceiling dominates: a shallow-but-wide net
        # whose biggest layer exceeds pbs_macro must stage regardless of depth
        if per_image["biggest"] > pbs_macro:
            jit = "staged"
        else:
            jit = True if len(model.layers) < 8 else "layer"

    if jit == "staged":
        forward = build_staged_forward(model, dkey, pbs_chunk, pbs_macro, info,
                                       escalate=escalate)
        forward.impl = impl
        forward.mode = "staged"
        forward.out_gain = model_out_gain(info)
        forward.out_center = model_out_center(info)
        forward.in_gain = model_in_gain(info)
        return forward

    # Worker-crash guard: remote-execution backends fall over above ~32k
    # bootstraps in ONE compiled program (PERFORMANCE.md "Known backend
    # ceilings"); a crash poisons the whole tunnel session, so fail fast.
    max_prog = int(os.environ.get("REDSEC_MAX_PROGRAM_BOOTS", "24000"))

    def _guard_batch(b: int, per_img: int, mode):
        if per_img * b > max_prog and jax.default_backend() not in ("cpu",):
            raise ValueError(
                f"{per_img * b} bootstraps in one {mode} program exceeds the "
                f"backend's ~{max_prog} per-program ceiling; lower the batch "
                f"(<= {max(1, max_prog // max(per_img, 1))}), use "
                f'jit="staged", or raise REDSEC_MAX_PROGRAM_BOOTS')

    key_arg = _key_material(dkey)
    if jit == "layer":
        layer_fns = [jax.jit(f) for f in
                     build_layer_impls(model, dkey.params, dkey.plan, pbs_chunk,
                                       info, bundle=dkey.bundle,
                                       rerand=dkey.rerand)]

        def forward(x: jax.Array) -> jax.Array:
            _guard_batch(x.shape[0], per_image["biggest"], "per-layer")
            for f in layer_fns:
                x = f(key_arg, dkey.ksk_limbs, x)
            return x.reshape(x.shape[0], -1, x.shape[-1])
    else:
        fn = jax.jit(impl) if jit else impl

        def forward(x: jax.Array) -> jax.Array:
            if jit:
                _guard_batch(x.shape[0], per_image["total"], "whole-model")
            return fn(key_arg, dkey.ksk_limbs, x)

    forward.impl = impl
    forward.mode = jit
    forward.out_gain = model_out_gain(info)
    forward.out_center = model_out_center(info)
    forward.in_gain = model_in_gain(info)
    return forward


def encrypt_images(sk, images: np.ndarray, params, rng=None,
                   gain: int = 1) -> np.ndarray:
    """Client-side: encrypt converted-pixel images [B, H, W, C] -> ciphertext
    tensor [B, H, W, C, n+1] (client/encrypt_image.cpp:73-80).

    ``gain``: model-input encoding gain (forward.in_gain) — pixels encrypt
    as gain*p, multiplying the first bootstrap's decision margins."""
    from ..crypto import lwe

    rng = rng or np.random.default_rng(0)
    images = np.asarray(images, np.int64) * int(gain)
    return lwe.encrypt_integers(sk.lwe_key, images, params, rng)


def decrypt_scores(sk, scores_ct: np.ndarray, params,
                   out_gain: int = 1, centers=None) -> np.ndarray:
    """Client-side: decrypt class-score ciphertexts [B, classes, n+1] ->
    signed integers (client/decrypt_image.cpp:46-63).

    ``out_gain``: the forward's encoding gain (forward.out_gain) — scores
    are rescaled back to reference logit units (argmax-invariant).
    ``centers``: the forward's per-class decrypt-centering shift
    (forward.out_center) — subtracted after decode, recovering logits whose
    raw range exceeded +-msg_space/2 (runtime/ranges.py)."""
    from ..crypto import lwe

    raw = lwe.decrypt_integers(sk.lwe_key, np.asarray(scores_ct), params)
    if out_gain != 1:
        raw = np.rint(raw / out_gain).astype(raw.dtype)
    if centers is not None:
        raw = raw - np.asarray(centers, raw.dtype)
    return raw
