"""Multi-chip execution: device meshes and sharded encrypted inference.

The reference's scaling story is OpenMP threads + 40 CUDA streams + an
unused NUM_GPUS replication knob with no inter-GPU exchange (SURVEY.md §2.2).
The TPU-native story is a ``jax.sharding.Mesh`` with three axes
("dcn", "dp", "tp"; the host axis is data-parallel too — see make_mesh):

- ``dp``: data parallelism over the bootstrap batch (activations are
  independent between bootstraps — embarrassingly parallel, rides on XLA's
  SPMD partitioner with zero collectives).
- ``tp``: tensor parallelism over a layer's fan-in: conv/fc partial sums are
  computed from a fan-in shard on each device and combined with ``psum``
  over ICI; the following bootstrap batch is then sharded over the layer's
  output neurons.

Evaluation keys (BK in NTT domain + KSK) are replicated — they are shared
read-only state, exactly like weights in standard inference serving.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: one process per host, chips per host over ICI,
    hosts over DCN. After this, ``jax.devices()`` spans the full slice and
    ``make_mesh(dcn=jax.process_count())`` lays the batch axis across hosts.

    The reference has no distributed backend at all (SURVEY.md §2.2: NUM_GPUS
    replication without exchange); this is the TPU-native replacement."""
    jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(n_devices: Optional[int] = None, tp: int = 1, dcn: int = 1) -> Mesh:
    """Device mesh ("dcn", "dp", "tp").

    - ``dcn``: host axis (data parallelism over DCN). Bootstrap batches are
      independent, so the only DCN traffic is input/output ciphertexts —
      scaling efficiency is bounded by per-host batch utilization, not
      communication (>= the 70% BASELINE target by construction).
    - ``dp``: intra-host data parallelism (zero collectives).
    - ``tp``: fan-in tensor parallelism (psum over ICI only; never DCN).

    On a real slice, pass ``dcn=jax.process_count()`` —
    ``jax.devices()`` orders devices process-major, so reshaping
    (dcn, dp, tp) puts each host's chips in one dcn row and every tp group
    within one host's ICI domain."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % (tp * dcn) == 0, (n, tp, dcn)
    arr = np.array(devs[:n]).reshape(dcn, n // (tp * dcn), tp)
    return Mesh(arr, axis_names=("dcn", "dp", "tp"))


def shard_ciphertext_batch(ct: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a ciphertext batch [B, ...] sharded over dp, replicated over tp."""
    spec = P(("dcn", "dp"), *([None] * (ct.ndim - 1)))
    return jax.device_put(ct, NamedSharding(mesh, spec))


def build_dp_encrypted_forward(model, dkey, mesh: Mesh):
    """Data-parallel whole-model encrypted forward: batch sharded over dp,
    evaluation key replicated.

    Every stage is batch-elementwise (including the bootstraps), so the SPMD
    partitioner runs the full pipeline without cross-device communication;
    scaling efficiency is limited only by the replicated-key HBM footprint.
    """
    from ..runtime.encrypted import build_forward_impl

    impl = build_forward_impl(model, dkey.params, dkey.plan, bundle=dkey.bundle)
    repl = NamedSharding(mesh, P())
    key_specs = (
        tuple(repl for _ in dkey.bk_ntt),  # bk_ntt tuple
        repl,  # ksk_limbs
    )
    in_spec = (*key_specs, NamedSharding(mesh, P(("dcn", "dp"), None, None, None, None)))
    out_spec = NamedSharding(mesh, P(("dcn", "dp"), None, None))
    jitted = jax.jit(impl, in_shardings=in_spec, out_shardings=out_spec)

    def forward(x):
        return jitted(dkey.bk_ntt, dkey.ksk_limbs, x)

    return forward


def fc_sign_tp(x_ct: jax.Array, weights: np.ndarray, bias: np.ndarray,
               dkey, mesh: Mesh):
    """Fan-in-sharded FC + sign layer: the tp building block.

    ``x_ct``: [B, K, R] ciphertexts with K (fan-in) sharded over tp and B over
    dp; ``weights``: int [K, O].  Each device contracts its fan-in shard on
    the MXU, partial LWE sums are ``psum``-combined over ICI, and the output
    neurons are re-sharded over tp so each device bootstraps O/tp of them.
    Returns [B, O, R] sharded (dp, tp).
    """
    from ..crypto.bootstrap import const_test_vector, make_bootstrap_impl
    from ..crypto.torus import mod_switch_to_torus32
    from ..ops.encrypted import ternary_matmul_ct

    params = dkey.params
    pbs_impl = make_bootstrap_impl(params, dkey.plan, bundle=dkey.bundle)
    tp = mesh.shape["tp"]
    O = weights.shape[1]
    assert O % tp == 0, (O, tp)
    w_dev = jnp.asarray(weights, dtype=jnp.int8)
    bias_mu = jnp.asarray(mod_switch_to_torus32(bias, params.msg_space), jnp.int32)
    tv = jnp.asarray(const_test_vector(params, 1, params.msg_space))

    def body(x_local, w_local, bias_mu_all, bk_ntt, ksk_limbs):
        # x_local [B/dp, K/tp, R]; w_local [K/tp, O]
        part = ternary_matmul_ct(x_local[:, None], w_local)[:, 0]  # [B/dp, O, R]
        full = jax.lax.psum(part, "tp")  # fan-in combine over ICI
        # each tp member bootstraps its O/tp slice of the output neurons
        ti = jax.lax.axis_index("tp")
        chunk = O // tp
        mine = jax.lax.dynamic_slice_in_dim(full, ti * chunk, chunk, axis=1)
        mu = jax.lax.dynamic_slice_in_dim(bias_mu_all, ti * chunk, chunk)
        mine = mine.at[..., -1].add(mu)
        b_local = mine.shape[0]
        out = pbs_impl(bk_ntt, ksk_limbs, mine.reshape(-1, mine.shape[-1]), tv)
        return out.reshape(b_local, chunk, -1)

    shard = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(("dcn", "dp"), "tp", None), P("tp", None), P(),
                  tuple(P() for _ in dkey.bk_ntt), P()),
        out_specs=P(("dcn", "dp"), "tp", None),
    )
    return shard(x_ct, w_dev, bias_mu, dkey.bk_ntt, dkey.ksk_limbs)


# --------------------------------------------------------------------------- #
# Whole-model tensor-parallel forward                                         #
# --------------------------------------------------------------------------- #


def _plan_tp_layers(model, params, tp: int):
    """Host-side prep for the tp forward: per-layer device arrays + specs.

    Activations stay channel-sharded [B/dp, H, W, C/tp, R] between layers;
    a layer whose channel count does not divide tp falls back to replicated
    compute (every device redundantly evaluates it — deterministic integer
    math keeps replicas bit-identical).  Conv weights ship arranged
    [wh, ww, H?, W?, C, O] so the CHANNEL axis is the sharded one even after
    an FC flatten (the flatten order is (h, w, c), so a contiguous K shard
    would straddle channels)."""
    from ..crypto.bootstrap import const_test_vector
    from ..crypto.torus import mod_switch_to_torus32
    from ..models.spec import Activation
    from ..ops.encrypted import maxpool_sign_value, relu_fdfb_test_vectors
    from ..runtime.encrypted import _resolve_info

    info = _resolve_info(model, params)
    msize = params.msg_space
    layers = []
    in_sharded = False  # input images are replicated over tp
    h, w, c = model.in_dim.h, model.in_dim.w, model.in_dim.in_dep
    for i, layer in enumerate(model.layers):
        args, specs = [], []
        L = {"layer": layer, "i": i}
        if layer.conv is not None:
            cv = layer.conv
            wts = cv.weights  # [wh, ww, K, O]
            if cv.flatten:
                # arrange K = (h, w, c) so the c axis is shardable
                wts = wts.reshape(wts.shape[0], wts.shape[1], h, w, c,
                                  cv.out_dep)
                wspec = P(None, None, None, None, "tp" if in_sharded else None,
                          None)
            else:
                wspec = P(None, None, "tp" if in_sharded else None, None)
            args.append(jnp.asarray(wts, jnp.int8))
            specs.append(wspec)
            h, w, c = cv.out_h, cv.out_w, cv.out_dep
        # the replicated->sharded transition happens at the conv's own-chunk
        # slice, so conv-less layers keep their input layout; bootstrap-free
        # layers stay replicated (nothing to re-shard over)
        out_sharded = (
            (layer.conv is not None and c % tp == 0
             and (layer.quant.mode != Activation.NONE
                  or layer.maxpool is not None))
            or (layer.conv is None and in_sharded)
        )
        L["in_sharded"], L["out_sharded"] = in_sharded, out_sharded
        ospec = P("tp") if out_sharded else P()
        r = info[i]
        L["gains"] = (r.in_gain, r.out_gain)
        if layer.conv is not None and layer.conv.neg_correction is not None:
            mu = mod_switch_to_torus32(
                layer.conv.neg_correction.astype(np.int64) * r.in_gain, msize)
            args.append(jnp.asarray(mu, jnp.int32))
            specs.append(ospec)
        q = layer.quant
        if q.mode in (Activation.SIGN, Activation.NONE):
            args.append(jnp.asarray(
                mod_switch_to_torus32(q.bias.astype(np.int64) * r.in_gain,
                                      msize), jnp.int32))
            specs.append(ospec)
            if q.mode == Activation.SIGN:
                ov = (maxpool_sign_value(layer.maxpool, params)
                      if layer.maxpool is not None else r.out_gain)
                L["tv_sign"] = jnp.asarray(const_test_vector(params, ov, msize))
        elif r.relu_mode == "quarter":
            from ..ops.encrypted import relu_test_vectors

            L["center"] = r.center is not None
            if L["center"]:
                args.append(jnp.asarray(mod_switch_to_torus32(
                    np.asarray(r.center, np.int64) * r.in_gain, msize),
                    jnp.int32))
                specs.append(P("tp") if out_sharded else P())
            args.append(jnp.asarray(
                relu_test_vectors(q, params, r.in_gain, r.out_gain,
                                  r.center)))  # [C, N]
            specs.append(P("tp") if out_sharded else P())
            L["relu"] = "quarter"
        else:
            L["center"] = r.center is not None
            if L["center"]:
                args.append(jnp.asarray(mod_switch_to_torus32(
                    np.asarray(r.center, np.int64) * r.in_gain, msize),
                    jnp.int32))
                specs.append(P("tp") if out_sharded else P())
            tv_o, tv_e, c_seam = relu_fdfb_test_vectors(q, params, r.in_gain,
                                                        r.out_gain, r.center)
            args.append(jnp.asarray(tv_o))
            specs.append(P("tp") if out_sharded else P())
            args.append(jnp.asarray(tv_e))
            specs.append(P("tp") if out_sharded else P())
            args.append(jnp.asarray(c_seam))
            specs.append(P("tp") if out_sharded else P())
            L["relu"] = "full"
            L["tv_sign_fdfb"] = jnp.asarray(
                const_test_vector(params, msize // 4, msize))
        if layer.sumpool is not None:
            h, w = layer.sumpool.out_h, layer.sumpool.out_w
        if layer.maxpool is not None:
            h, w = layer.maxpool.out_h, layer.maxpool.out_w
        L["args"], L["specs"] = args, specs
        layers.append(L)
        in_sharded = out_sharded
    return layers, info


def build_tp_encrypted_forward(model, dkey, mesh: Mesh, pbs_chunk: int = 512):
    """Whole-model encrypted forward with fan-in tensor parallelism:
    [B, H, W, C, n+1] (replicated over tp, B sharded over dcn x dp) ->
    [B, classes, n+1].

    Every conv/FC contracts a CHANNEL shard of its fan-in per device, psums
    the partial LWE sums over ICI, and re-shards the bootstraps over output
    channels (each device bootstraps C/tp of them) — the whole-model
    generalization of ``fc_sign_tp``.  Bit-exact vs the single-device
    forward: int32 mod-2^32 sums are order-independent, so resharding
    cannot change results (SURVEY.md §7.3 item 6).
    """
    from ..crypto.bootstrap import make_chunked_impl
    from ..crypto.torus import mod_switch_to_torus32
    from ..models.spec import Activation
    from ..ops.encrypted import maxpool_sign_value, ternary_matmul_ct
    from ..runtime.ptxt import gather_patches

    params = dkey.params
    tp = mesh.shape["tp"]
    msize = params.msg_space
    pbs_impl = make_chunked_impl(params, dkey.plan, chunk=pbs_chunk,
                                 bundle=dkey.bundle)
    layers, info = _plan_tp_layers(model, params, tp)

    def conv_local(cv, x, wts):
        B, R = x.shape[0], x.shape[-1]
        if cv.flatten:
            # wts [wh, ww, h, w, c_local, O] -> [1, 1, h*w*c_local, O]
            wts = wts.reshape(1, 1, -1, wts.shape[-1])
            x = x.reshape(B, 1, 1, -1, R)
        out = None
        for fh in range(wts.shape[0]):
            for fw in range(wts.shape[1]):
                tap = gather_patches(
                    x, (1, 1), cv.stride,
                    (cv.offset[0] - fh, cv.offset[1] - fw),
                    (cv.out_h, cv.out_w),
                )
                tap = tap.reshape(B, cv.out_h * cv.out_w, -1, R)
                part = ternary_matmul_ct(tap, wts[fh, fw])
                out = part if out is None else out + part
        return out.reshape(B, cv.out_h, cv.out_w, wts.shape[-1], R)

    def body(x, bk_ntt, ksk_limbs, *flat_args):
        def pbs(ct, tv):
            return pbs_impl(bk_ntt, ksk_limbs, ct, tv)

        pos = 0
        for L in layers:
            layer, args = L["layer"], flat_args[pos : pos + len(L["specs"])]
            pos += len(L["specs"])
            ai = 0
            if layer.conv is not None:
                part = conv_local(layer.conv, x, args[ai])
                ai += 1
                x = jax.lax.psum(part, "tp") if L["in_sharded"] else part
                if L["out_sharded"]:
                    # keep only this device's output-channel slice
                    ti = jax.lax.axis_index("tp")
                    chunk = x.shape[3] // tp
                    x = jax.lax.dynamic_slice_in_dim(x, ti * chunk, chunk, 3)
                if layer.conv.neg_correction is not None:
                    x = x.at[..., -1].add(-args[ai])
                    ai += 1
            if layer.sumpool is not None:
                sp = layer.sumpool
                x = gather_patches(x, sp.window, sp.stride, sp.offset,
                                   (sp.out_h, sp.out_w)).sum(
                    axis=(3, 4), dtype=jnp.int32)
            q = layer.quant
            shp = x.shape
            if q.mode == Activation.SIGN:
                x = x.at[..., -1].add(args[ai])
                ai += 1
                x = pbs(x.reshape(-1, shp[-1]), L["tv_sign"]).reshape(shp)
            elif q.mode == Activation.NONE:
                x = x.at[..., -1].add(args[ai])
                ai += 1
            elif L["relu"] == "quarter":
                if L.get("center"):
                    x = x.at[..., -1].add(args[ai])
                    ai += 1
                tvs = args[ai]
                ai += 1
                half = jnp.int32(int(mod_switch_to_torus32(msize // 4, msize)))
                x = x.at[..., -1].add(half)
                C = shp[3]
                m = shp[0] * shp[1] * shp[2] * C
                tv_all = jnp.broadcast_to(
                    tvs[None], (m // C, C, params.N)).reshape(m, params.N)
                x = pbs(x.reshape(-1, shp[-1]), tv_all).reshape(shp)
            else:  # full-range FDFB relu
                if L.get("center"):
                    x = x.at[..., -1].add(args[ai])
                    ai += 1
                tv_o, tv_e, c_seam = args[ai], args[ai + 1], args[ai + 2]
                ai += 3
                quarter = jnp.int32(int(mod_switch_to_torus32(msize // 4, msize)))
                flat = x.reshape(-1, shp[-1])
                C = shp[3]
                m = flat.shape[0]
                s = pbs(flat, L["tv_sign_fdfb"])
                ct2 = (flat - s).at[:, -1].add(quarter)
                tvs_o = jnp.broadcast_to(
                    tv_o[None], (m // C, C, params.N)).reshape(m, params.N)
                tvs_e = jnp.broadcast_to(
                    tv_e[None], (m // C, C, params.N)).reshape(m, params.N)
                out = pbs(flat, tvs_o) + pbs(ct2, tvs_e)
                cf = jnp.broadcast_to(c_seam[None], (m // C, C)).reshape(m)
                x = out.at[:, -1].add(cf).reshape(shp)
            if layer.maxpool is not None:
                mp = layer.maxpool
                V = maxpool_sign_value(mp, params)
                patches = gather_patches(x, mp.window, mp.stride, mp.offset,
                                         (mp.out_h, mp.out_w))
                ssum = patches.sum(axis=(3, 4), dtype=jnp.int32)
                ih = (np.arange(mp.out_h)[:, None] * mp.stride[0]
                      + np.arange(mp.window[0])[None, :] - mp.offset[0])
                iw = (np.arange(mp.out_w)[:, None] * mp.stride[1]
                      + np.arange(mp.window[1])[None, :] - mp.offset[1])
                cnt = (((ih >= 0) & (ih < mp.in_h)).sum(1)[:, None]
                       * ((iw >= 0) & (iw < mp.in_w)).sum(1)[None, :])
                bias_mu = mod_switch_to_torus32((cnt - 1) * V, msize)
                ssum = ssum.at[..., -1].add(
                    jnp.asarray(bias_mu, jnp.int32)[None, :, :, None])
                g_out = L["gains"][1]
                tv1 = jnp.asarray(
                    np.full(params.N,
                            int(mod_switch_to_torus32(np.int64(g_out), msize)),
                            np.int32))
                x = pbs(ssum.reshape(-1, ssum.shape[-1]), tv1).reshape(ssum.shape)
        return x.reshape(x.shape[0], -1, x.shape[-1])

    in_specs = (
        P(("dcn", "dp"), None, None, None, None),  # x replicated over tp
        tuple(P() for _ in dkey.bk_ntt),
        P(),
        *[s for L in layers for s in L["specs"]],
    )
    out_spec = P(("dcn", "dp"), None, None)  # final layer is replicated
    shard = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
    ))
    flat_args = [a for L in layers for a in L["args"]]

    def forward(x):
        return shard(x, dkey.bk_ntt, dkey.ksk_limbs, *flat_args)

    from ..runtime.encrypted import model_out_gain

    forward.tp_layout = [(L["in_sharded"], L["out_sharded"]) for L in layers]
    forward.out_gain = model_out_gain(info)
    return forward
