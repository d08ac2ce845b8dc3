"""Polynomial-dimension (NTT-stage) sharding: all-to-all over ICI.

The third scaling axis named by SURVEY.md §5 and the BASELINE north star
("all-to-all for NTT stage exchanges if the polynomial dimension is
sharded"): shard the N-point polynomial itself across chips, inside each
bootstrap, rather than only sharding the batch (dp) or a layer's fan-in (tp).

Design — the four-step factorization N = R*C (crypto/ntt_matmul.py) makes
this a textbook distributed FFT with exactly ONE all-to-all per direction:

  coefficient domain, sharded over j2 (column blocks of the [R, C] view)
    -> twist (pointwise, local)
    -> NTT_R  (MXU matmul contracting j1 — fully local)
    -> twiddle w^(k1*j2) (pointwise, local)
    -> ALL-TO-ALL  (re-shard: split k1, concat j2)        <- the ICI exchange
    -> NTT_C  (MXU matmul contracting j2 — fully local)
  frequency domain, sharded over k1 (contiguous blocks of the flat N axis)

The bootstrapping key lives PERMANENTLY frequency-sharded over k1: each
device holds N/sp of every BK polynomial, so the device-resident eval-key
footprint (229 MB at small_v2, PERFORMANCE.md) divides by the poly-axis size
— the one resource that dp replication cannot shrink.  The key switch is
likewise row-sharded with a psum combine.  Only the accumulator (2*N int32
per ciphertext) stays replicated in coefficient domain, where the
data-dependent negacyclic rotation is a local permutation.

Per CMUX round the exchange volume is rows * N * 4 B per prime per direction
(~200 KB/ciphertext at small_v2) against ~5.8 M VPU ops of transform work —
bandwidth-trivial on ICI; the win is eval-key HBM and single-bootstrap
latency, complementing dp (throughput) and tp (fan-in).

All arithmetic is the same exact CRT-NTT as the single-device path
(reusing crypto/ntt_matmul tables and crypto/bootstrap.RoundOps), so results
are bit-identical to the single-device bootstrap — asserted by
tests/test_ntt_shard.py on the 8-virtual-device mesh.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..crypto import ntt as ntt_mod
from ..crypto import ntt_matmul as mm
from ..crypto.bootstrap import BK_LIMBS, DeviceCloudKey, RoundOps
from ..crypto.ntt import crt_to_torus32


def _axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis]


def poly_shard_viable(N: int, sp: int) -> bool:
    """The poly axis must divide both four-step factors: R (frequency k1
    blocks) and C (coefficient j2 blocks)."""
    if not mm.supported(N):
        return False
    R, C = mm._split_rc(N)
    return R % sp == 0 and C % sp == 0


# --------------------------------------------------------------------------- #
# Sharded four-step transform bodies (called INSIDE shard_map)                #
# --------------------------------------------------------------------------- #


def _fwd_local(x_loc, plan, pi, axis: str, sp: int):
    """Forward sharded NTT body: x_loc int32 [B, R, C/sp] in [0, p)
    (coefficient order, j2-sharded) -> [B, R/sp, C] (frequency, k1-sharded)."""
    p = plan.primes[pi]
    t = mm._tables_for(plan, pi)
    R, C = t["R"], t["C"]
    Cl = C // sp
    ti = jax.lax.axis_index(axis)
    tw_slice = jax.lax.dynamic_slice_in_dim(
        jnp.asarray(t["twist"], jnp.int32), ti * Cl, Cl, axis=1)
    m = ntt_mod._mulmod_device(x_loc, tw_slice[None], p)
    a = mm._exact_matmul_mod(m, t["WR"], p, "left")  # [B, k1=R, j2_loc]
    tw2 = jax.lax.dynamic_slice_in_dim(
        jnp.asarray(t["TW"], jnp.int32), ti * Cl, Cl, axis=1)
    a = ntt_mod._mulmod_device(a, tw2[None], p)
    # ICI exchange: re-shard from j2 to k1
    a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=2, tiled=True)
    return mm._exact_matmul_mod(a, t["WC"], p, "right")  # [B, R/sp, k2=C]


def _inv_local(y_loc, plan, pi, axis: str, sp: int):
    """Inverse sharded NTT body: y_loc int32 [B, R/sp, C] (frequency,
    k1-sharded) -> [B, R, C/sp] (coefficient order, j2-sharded)."""
    p = plan.primes[pi]
    t = mm._tables_for(plan, pi)
    R, C = t["R"], t["C"]
    Rl, Cl = R // sp, C // sp
    ti = jax.lax.axis_index(axis)
    b = mm._exact_matmul_mod(y_loc, t["WCi"], p, "right")  # [B, k1_loc, j2]
    twi = jax.lax.dynamic_slice_in_dim(
        jnp.asarray(t["TWi"], jnp.int32), ti * Rl, Rl, axis=0)
    b = ntt_mod._mulmod_device(b, twi[None], p)
    # ICI exchange: re-shard from k1 back to j2
    b = jax.lax.all_to_all(b, axis, split_axis=2, concat_axis=1, tiled=True)
    x = mm._exact_matmul_mod(b, t["WRi"], p, "left")  # [B, j1, j2_loc]
    un = jax.lax.dynamic_slice_in_dim(
        jnp.asarray(t["untwist"], jnp.int32), ti * Cl, Cl, axis=1)
    return ntt_mod._mulmod_device(x, un[None], p)


def make_ntt_poly_sharded(plan, pi: int, mesh: Mesh, axis: str = "tp"):
    """Standalone sharded transforms for testing/benchmarks.

    Returns ``(fwd, inv)``:
    - ``fwd``: [B, R, C] (coefficient, j2 axis sharded over ``axis``)
      -> [B, N] (four-step frequency order, contiguously sharded).
    - ``inv``: the exact inverse.
    Bit-identical to ``ntt_matmul.ntt_device_mm`` / ``intt_device_mm``.
    """
    sp = _axis_size(mesh, axis)
    R, C = mm._split_rc(plan.N)
    assert poly_shard_viable(plan.N, sp), (plan.N, sp)

    def fwd_body(x_loc):
        z = _fwd_local(x_loc, plan, pi, axis, sp)  # [B, R/sp, C]
        return z.reshape(z.shape[0], -1)  # [B, N/sp]

    def inv_body(y_loc):
        y3 = y_loc.reshape(y_loc.shape[0], R // sp, C)
        return _inv_local(y3, plan, pi, axis, sp)  # [B, R, C/sp]

    fwd = jax.shard_map(fwd_body, mesh=mesh,
                        in_specs=P(None, None, axis), out_specs=P(None, axis))
    inv = jax.shard_map(inv_body, mesh=mesh,
                        in_specs=P(None, axis), out_specs=P(None, None, axis))
    return fwd, inv


# --------------------------------------------------------------------------- #
# Poly-sharded bootstrap                                                      #
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class PolyShardedKey:
    """Eval key laid out for poly-sharded evaluation: BK frequency axis and
    KSK rows sharded over the poly axis — per-device HBM divides by sp."""

    bk_ntt: tuple
    ksk_limbs: jax.Array
    mesh: Mesh
    axis: str


def shard_cloud_key_poly(dkey: DeviceCloudKey, mesh: Mesh,
                         axis: str = "tp") -> PolyShardedKey:
    """Re-place a device key with the BK frequency axis sharded over
    ``axis`` (contiguous N-blocks = k1 blocks of the four-step order) and the
    KSK digit-row axis sharded the same way.

    Requires a key prepared under the four-step ordering
    (``REDSEC_NTT=matmul`` at ``prepare_cloud_key`` time): the k1-contiguous
    frequency layout is what makes the shard a plain block slice.
    """
    if dkey.ntt_flavor != "matmul":
        raise ValueError(
            f"poly sharding needs a four-step-ordered key (flavor 'matmul'); "
            f"this key is {dkey.ntt_flavor!r} — re-run prepare_cloud_key "
            f"under REDSEC_NTT=matmul")
    if dkey.bundle != 1:
        raise ValueError("poly sharding does not support bundled (bundle=2) "
                         "keys yet; prepare an unbundled key")
    sp = _axis_size(mesh, axis)
    if not poly_shard_viable(dkey.params.N, sp):
        raise ValueError(f"N={dkey.params.N} cannot shard over {sp} devices")
    bk_spec = NamedSharding(mesh, P(None, None, None, None, axis))
    bk = tuple(jax.device_put(b, bk_spec) for b in dkey.bk_ntt)
    # ksk_limbs [4, N*t, n+1]: rows are (coefficient j, digit) flattened, so
    # a contiguous row block == a contiguous coefficient block
    ksk = jax.device_put(dkey.ksk_limbs, NamedSharding(mesh, P(None, axis, None)))
    return PolyShardedKey(bk_ntt=bk, ksk_limbs=ksk, mesh=mesh, axis=axis)


def exchange_bytes_per_round(p, plan, sp: int) -> dict:
    """Per-ciphertext ICI traffic of ONE CMUX round of the poly-sharded
    bootstrap (bytes actually crossing the interconnect, i.e. (sp-1)/sp of
    each resharded tensor):

    - forward all-to-all: decomposed digits, rows x N x 4 B per prime
    - inverse all-to-all: accumulator products, 2 polys x limbs x N x 4 B/prime
    - delta all-gather: 2 polys x N x 4 B x (sp-1)

    Validates the ~200 KB/ciphertext/round estimate in the module docstring
    (asserted in tests/test_ntt_shard.py)."""
    N, rows = p.N, p.decomp_rows
    np_ = len(plan.primes)
    f = (sp - 1) / sp
    fwd = rows * N * 4 * np_ * f
    inv = 2 * BK_LIMBS * N * 4 * np_ * f
    gather = 2 * N * 4 * (sp - 1)
    return {
        "fwd_all_to_all": int(fwd),
        "inv_all_to_all": int(inv),
        "delta_all_gather": int(gather),
        "total": int(fwd + inv + gather),
    }


def make_poly_sharded_bootstrap(dkey: DeviceCloudKey, mesh: Mesh,
                                axis: str = "tp",
                                batch_axes=("dcn", "dp")):
    """Batched PBS with the polynomial dimension sharded over ``axis`` (and
    the batch over ``batch_axes``): ``fn(ct [B, n+1], tv [N]) -> [B, n+1]``.

    Per CMUX round, each device: rotates/decomposes the (replicated,
    tiny) accumulator, forward-transforms only its j2 column block, exchanges
    once over ICI, multiplies against its resident k1 block of the BK,
    inverse-transforms, exchanges back, and all-gathers the coefficient
    delta.  Compute and key HBM divide by sp; results are bit-identical to
    the single-device path (int32 mod-2^32 arithmetic throughout).
    """
    p, plan = dkey.params, dkey.plan
    if plan is None:
        raise ValueError("poly sharding requires an NTT parameter set")
    skey = shard_cloud_key_poly(dkey, mesh, axis)
    sp = _axis_size(mesh, axis)
    N, n, rows = p.N, p.n, p.decomp_rows
    R, C = mm._split_rc(N)
    Rl, Cl, Nl = R // sp, C // sp, N // sp
    two_n = 2 * N
    ops = RoundOps(p)
    primes = plan.primes

    def pointwise_local(dn, bki, prime):
        """sum_j dn[b, j, nl] * bk[j, o, l, nl] mod prime (lazy int32)."""
        group = max(1, (2**31 - 1) // ((prime - 1) ** 2))
        partials = None
        for g0 in range(0, rows, group):
            g1 = min(g0 + group, rows)
            raw = (dn[:, g0:g1, None, None, :] * bki[None, g0:g1]).sum(axis=1)
            red = ntt_mod._reduce_int32(raw, prime)
            partials = red if partials is None else partials + red
        return ntt_mod._reduce_small(partials, prime)

    def body(ct, tv, bk_ntt, ksk_limbs):
        B = ct.shape[0]
        ti = jax.lax.axis_index(axis)
        abar = ops.mod_switch(ct[:, :n])
        bbar = ops.mod_switch(ct[:, n])
        tvb = jnp.broadcast_to(tv.reshape(-1, N).astype(jnp.int32), (B, N))
        acc_b = ops.rotate(tvb, (two_n - bbar) % two_n)
        acc = jnp.stack([jnp.zeros_like(acc_b), acc_b], axis=1)  # [B, 2, N]

        def round_body(i, acc):
            rot = ops.rotate(acc, abar[:, i])
            diff = rot - acc
            digits = ops.decompose(diff).astype(jnp.int32)  # [B, rows, N]
            d_loc = jax.lax.dynamic_slice_in_dim(
                digits.reshape(B, rows, R, C), ti * Cl, Cl, axis=3
            ).reshape(B * rows, R, Cl)
            conv = []  # per prime: [B, 2, limbs, Nl] coefficient j2-sharded
            for pi, prime in enumerate(primes):
                dmod = d_loc + np.int32(prime) * (d_loc < 0).astype(jnp.int32)
                dn = _fwd_local(dmod, plan, pi, axis, sp)  # [B*rows, Rl, C]
                dn = dn.reshape(B, rows, Nl)
                bki = jax.lax.dynamic_index_in_dim(
                    bk_ntt[pi], i, 0, keepdims=False).astype(jnp.int32)
                s = pointwise_local(dn, bki, prime)  # [B, 2, limbs, Nl]
                inv = _inv_local(s.reshape(-1, Rl, C), plan, pi, axis, sp)
                conv.append(inv.reshape(B, 2, BK_LIMBS, R, Cl))
            delta_loc = None
            for limb in range(BK_LIMBS):
                v = crt_to_torus32([c[:, :, limb] for c in conv], plan)
                if limb:
                    v = (v.astype(jnp.uint32) << np.uint32(8 * limb)).astype(jnp.int32)
                delta_loc = v if delta_loc is None else delta_loc + v
            delta = jax.lax.all_gather(
                delta_loc, axis, axis=3, tiled=True)  # [B, 2, R, C]
            return acc + delta.reshape(B, 2, N)

        acc = jax.lax.fori_loop(0, n, round_body, acc)
        a_n, b_n = ops.sample_extract(acc)
        # sharded key switch: local digit columns x local KSK rows, psum
        a_loc = jax.lax.dynamic_slice_in_dim(a_n, ti * Nl, Nl, axis=1)
        dig = ops.ks_digits(a_loc)  # [B, Nl*t]
        ssum = None
        for li in range(4):
            part = jax.lax.dot_general(
                dig, ksk_limbs[li],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            part = part << (8 * li) if li else part
            ssum = part if ssum is None else ssum + part
        out = -jax.lax.psum(ssum, axis)
        out = out.at[:, n].add(b_n)
        return out

    bspec = P(batch_axes)
    shard = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(batch_axes, None), P(),
                  tuple(P(None, None, None, None, axis) for _ in skey.bk_ntt),
                  P(None, axis, None)),
        out_specs=P(batch_axes, None),
        check_vma=False,
    )
    jitted = jax.jit(shard)

    def run(ct, tv):
        return jitted(ct, jnp.asarray(tv, jnp.int32), skey.bk_ntt,
                      skey.ksk_limbs)

    run.sharded_key = skey
    return run
