"""Batched programmable (gate) bootstrapping on device.

The reference spends ~99% of encrypted-inference wall time inside
``tfhe_bootstrap_FFT`` (one per activation, lib/BinOps_enc.cpp:182-192) and
parallelizes with OpenMP threads / 40 CUDA streams.  Here the whole batch of
activations is ONE tensor program: every step of the pipeline —

    mod-switch -> blind rotation (n CMUX rounds of TGSW external products in
    the CRT-NTT domain) -> sample extract -> key switch

— is vectorized over the batch dimension, so XLA maps it onto the TPU VPU
with the n-round loop as a ``lax.fori_loop`` and the bootstrapping key
streamed from HBM one round at a time.

All arithmetic is exact: int32 two's-complement for torus ops, int32+fp32
reciprocal mod-mul inside the NTT (see crypto/ntt.py).

Host-side reference implementations (numpy) of the same pipeline are provided
for cross-checking the device path on small parameter sets.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ntt as ntt_mod
from . import ntt_matmul
from .keygen import CloudKey, _crt_host
from .params import TfheParams
from .torus import mod_switch_to_torus32


@dataclasses.dataclass(frozen=True)
class DeviceCloudKey:
    """Device-resident evaluation key: BK pre-transformed to the CRT-NTT
    domain (uint16 residues), KSK as sign-balanced int8 limbs of the flat
    table so the key switch runs as one-hot x table int8 matmuls on the MXU.

    For parameter sets without NTT-friendly primes (N >= 4096: ``medium``
    and ``large``), ``plan`` is None and ``bk_ntt`` holds ONE int8 tensor
    [n, 8, rows, N]: reversed-tap 8-bit limbs of the BK polynomials, feeding
    the exact int8-convolution (schoolbook) external product."""

    params: TfheParams
    plan: ntt_mod.NttPlan | None
    bk_ntt: Tuple[jax.Array, ...]  # per prime: uint16 [n, rows, 2, limbs, N]
    ksk_limbs: jax.Array  # int8 [4, N * t, n+1] (multiply-form KSK)
    # Domain ordering the BK was transformed with ("radix2" bit-reversed,
    # "matmul" four-step, or "schoolbook" raw limbs). The digit transform at
    # bootstrap time MUST use the same ordering; binding asserts agreement.
    ntt_flavor: str = "radix2"
    # 2 when the key carries interleaved pair entries for the 2-bit bundled
    # blind rotation (bk_ntt per prime: [n/2, 3*rows, 2, limbs, N] packing
    # TGSW(s_2p), TGSW(s_2p+1), TGSW(s_2p*s_2p+1) row blocks); 1 otherwise.
    bundle: int = 1
    # Re-randomization pool [E, n+1] (encryptions of 0; keygen.CloudKey):
    # enables the majority-voted PBS.  None for keys saved before the pool
    # existed — majority then raises at forward build.
    rerand: jax.Array | None = None


def _int8_limbs_np(x: np.ndarray):
    """Split int32 into four sign-balanced int8 limbs (x = sum l_i * 256^i)."""
    limbs = []
    cur = x.astype(np.int64)
    for _ in range(3):
        lo = ((cur + 128) & 255) - 128
        limbs.append(lo.astype(np.int8))
        cur = (cur - lo) >> 8
    limbs.append(cur.astype(np.int8))
    return np.stack(limbs)


BK_LIMB_BITS = 8  # 4 x 8-bit limbs: keeps the row-accumulated external
# product provably inside the 2-prime CRT range (see ntt.primes_for)
BK_LIMBS = 32 // BK_LIMB_BITS


def _bootstrap_plan(p: TfheParams, bundled: bool = False) -> ntt_mod.NttPlan | None:
    """NTT plan for the parameter set, or None when no int32-range NTT primes
    exist for N (>= 4096) — those sets use the exact conv-schoolbook external
    product instead (REDSEC_FORCE_SCHOOLBOOK=1 forces it everywhere).

    The CRT range bound depends on how many products are accumulated in the
    NTT domain before leaving it: ``rows`` for the plain external product,
    ``3*rows`` for a 2-bit bundled CMUX round (three TGSW contractions summed
    at once).  Sign-balanced BK limbs halve the bound; with them the 2-prime
    plan covers every shipped N=1024/2048 set unbundled, and all but
    small_v2_tpu2 bundled (bundled tpu2's bound 2*30*1024*32*128 exceeds the
    12289*18433 product, so it genuinely needs a third prime)."""
    if os.environ.get("REDSEC_FORCE_SCHOOLBOOK", "0") != "0":
        return None
    try:
        return ntt_mod.make_plan(
            p.N, max_operand=p.half_bg, limb_bits=BK_LIMB_BITS,
            accum=(3 if bundled else 1) * p.decomp_rows, balanced=True,
        )
    except ValueError:
        return None


def lazy_pointwise_passes(prime: int, contract_rows: int) -> int:
    """Materialize+reduce passes the lazy pointwise needs: rows are grouped
    so each int32 partial accumulates < (prime-1)^2 * group without overflow.
    Sub-2^15 primes (12289/18433) cover the shipped row counts in 1-2 passes
    (<= 6 bundled, which measures ON the pass-floor model); N=2048's forced
    40961 ((p-1)^2 = 1.68e9) gets group=1 -> one full [B, 2, limbs, N]
    partial + reduction PER ROW — the round-5 n2048 throughput anomaly
    (results/tpu_r5_n2048.log, PERFORMANCE.md round-5 section)."""
    group = max(1, (2**31 - 1) // ((prime - 1) ** 2))
    return -(-contract_rows // group)


def pointwise_is_gemm(mode: str, prime: int, contract_rows: int) -> bool:
    """Per-prime pointwise flavor: 'auto' keeps the fused lazy reduction
    up to 6 passes and switches to the bf16 lo/hi-split GEMM (pass count
    independent of rows; exact while contract_rows * 255^2 < 2^24 keeps
    the f32 accumulation integer-representable) beyond that.  The
    threshold is measured, not guessed: small_v2_tpu bundled runs 9 lazy
    passes across its two primes at +0.9% of the pass-floor model (XLA
    fuses the short group chain), while n2048's 20-pass 40961 branch is
    the anomaly — only the degenerate regime moves."""
    if mode == "auto":
        return lazy_pointwise_passes(prime, contract_rows) > 6
    return mode == "gemm"


def _use_blind_kernel(p: TfheParams, plan: ntt_mod.NttPlan | None) -> bool:
    """Whole-blind-rotation Pallas mega-kernel (REDSEC_BLIND_KERNEL=1)."""
    if plan is None or os.environ.get("REDSEC_BLIND_KERNEL", "0") == "0":
        return False
    if not _use_matmul_ntt(p.N):
        return False  # kernel tables use the four-step (matmul) ordering
    from . import pallas_blind

    return pallas_blind.supported(p, plan)


def _key_material(dkey: "DeviceCloudKey"):
    """The key-argument form the bootstrap impl expects: the packed int16
    streaming tensor for the mega-kernel path, else the per-prime tuple.
    Asserts the key's NTT-domain ordering matches the active flavor (a key
    prepared under one flavor is garbage under the other)."""
    p, plan = dkey.params, dkey.plan
    expect = ("schoolbook" if plan is None
              else "matmul" if _use_matmul_ntt(p.N) else "radix2")
    if dkey.ntt_flavor != expect:
        raise ValueError(
            f"device key was prepared with NTT flavor {dkey.ntt_flavor!r} but "
            f"the current configuration needs {expect!r}; re-run "
            f"prepare_cloud_key under the same REDSEC_NTT setting"
        )
    if _use_blind_kernel(p, plan):
        if dkey.bundle != 1:
            raise ValueError(
                "REDSEC_BLIND_KERNEL does not support bundled keys; prepare "
                "an unbundled key or unset the flag")
        from . import pallas_blind

        return pallas_blind.pack_bk_int16(dkey.bk_ntt)
    return dkey.bk_ntt


def _use_matmul_ntt(N: int) -> bool:
    """NTT flavor: radix-2 butterflies (default) or the four-step MXU matmul
    formulation (REDSEC_NTT=matmul). Both are exact; measured end-to-end
    bootstrap rates on the current backend favor radix-2 (534/s vs 486/s at
    batch 512) — the matmul flavor pays N-major relayouts around the
    contraction that the butterfly chain avoids."""
    return os.environ.get("REDSEC_NTT", "radix2") == "matmul" and ntt_matmul.supported(N)


def _fwd_ntt(x, plan, pi):
    if _use_matmul_ntt(plan.N):
        return ntt_matmul.ntt_device_mm(x, plan, pi)
    return ntt_mod.ntt_device(x, plan, pi)


def _inv_ntt(y, plan, pi):
    if _use_matmul_ntt(plan.N):
        return ntt_matmul.intt_device_mm(y, plan, pi)
    return ntt_mod.intt_device(y, plan, pi)


def _int8_limbs_device(x):
    """int32 [...] -> list of 4 sign-balanced int8 limb arrays.

    Recombination sum(l_i * 256^i) is exact mod 2^32 (the top limb is
    mod-256-balanced, which suffices: its excess is a multiple of 2^32)."""
    limbs = []
    cur = x
    for _ in range(4):
        lo = ((cur + np.int32(128)) & np.int32(255)) - np.int32(128)
        limbs.append(lo.astype(jnp.int8))
        cur = (cur - lo) >> np.int32(8)
    return limbs


def _prepare_cloud_key_schoolbook(cloud: CloudKey, chunk: int) -> DeviceCloudKey:
    """Device key prep for parameter sets without NTT primes (medium/large,
    client/gen_secure_keyset.cpp:9-45): the BK becomes reversed-tap int8
    limbs [n, 2*4, rows, N] feeding one exact int8 convolution per round
    (accumulation bound rows*N*128^2 < 2^31 for all shipped sets)."""
    p = cloud.params
    rows = p.decomp_rows
    bk_dev = jnp.asarray(cloud.bk.astype(np.int32))  # [n, rows, 2, N]

    @jax.jit
    def transform_chunk(bk):
        limbs = jnp.stack(_int8_limbs_device(bk), axis=0)  # [4, c, rows, 2, N]
        k = limbs[..., ::-1]  # reversed taps for the valid correlation
        # -> [c, 2*4, rows, N]: channel (u*4 + bl)
        return k.transpose(1, 3, 0, 2, 4).reshape(bk.shape[0], 8, rows, p.N)

    parts = [transform_chunk(bk_dev[i0 : i0 + chunk]) for i0 in range(0, p.n, chunk)]
    bk_sb = jnp.concatenate(parts, axis=0)
    ksk_limbs = jnp.asarray(
        _int8_limbs_np(cloud.ksk.reshape(-1, p.n + 1).astype(np.int32))
    )
    return DeviceCloudKey(params=p, plan=None, bk_ntt=(bk_sb,),
                          ksk_limbs=ksk_limbs, ntt_flavor="schoolbook",
                          rerand=(None if cloud.rerand is None
                                  else jnp.asarray(cloud.rerand.astype(np.int32))))


def prepare_cloud_key(cloud: CloudKey, chunk: int = 64) -> DeviceCloudKey:
    """Transform the host CloudKey for device evaluation (NTT of each BK
    polynomial's 8-bit limbs, per CRT prime).

    Only the RAW coefficient-domain key crosses host->device (~57 MB for
    small_v2 — tunnel/DCN friendly); the limb split and forward NTTs run
    on-device, in ``chunk``-sized slices of key bits to bound the working set.
    """
    p = cloud.params
    plan = _bootstrap_plan(p, bundled=cloud.bk_pair is not None)
    if plan is None:
        return _prepare_cloud_key_schoolbook(cloud, chunk)
    bundle = 1
    bk_host = cloud.bk
    if cloud.bk_pair is not None:
        # interleave per pair: [bk(s_2p) rows | bk(s_2p+1) rows | bk(pair)]
        # so one dynamic round slice feeds all three external products of a
        # bundled CMUX round as a single 3*rows contraction
        rows_, n2 = p.decomp_rows, p.n // 2
        bk_host = np.concatenate(
            [cloud.bk.reshape(n2, 2, rows_, 2, p.N),
             cloud.bk_pair[:, None]], axis=1,
        ).reshape(n2, 3 * rows_, 2, p.N)
        bundle = 2
    bk_dev = jnp.asarray(bk_host.astype(np.int32))  # [n(/2), (3*)rows, 2, N]

    @jax.jit
    def transform_chunk(bk):
        # sign-balanced int8 limbs (|limb| <= 128): halves the exact
        # convolution bound vs unsigned masks, which is what keeps the
        # bundled 3*rows accumulation inside the 2-prime CRT range
        limbs = jnp.stack(_int8_limbs_device(bk), axis=3).astype(jnp.int32)
        # [chunk, rows, 2, limbs, N]
        out = []
        for pi, prime in enumerate(plan.primes):
            lmod = limbs + np.int32(prime) * (limbs < 0).astype(jnp.int32)
            out.append(_fwd_ntt(lmod, plan, pi).astype(jnp.uint16))
        return tuple(out)

    parts = [[] for _ in plan.primes]
    for i0 in range(0, bk_dev.shape[0], chunk):
        res = transform_chunk(bk_dev[i0 : i0 + chunk])
        for pi, r in enumerate(res):
            parts[pi].append(r)
    bk_ntt = tuple(jnp.concatenate(ps, axis=0) for ps in parts)
    ksk_limbs = jnp.asarray(
        _int8_limbs_np(cloud.ksk.reshape(-1, p.n + 1).astype(np.int32))
    )
    return DeviceCloudKey(
        params=p, plan=plan, bk_ntt=tuple(bk_ntt), ksk_limbs=ksk_limbs,
        ntt_flavor="matmul" if _use_matmul_ntt(p.N) else "radix2",
        bundle=bundle,
        rerand=(None if cloud.rerand is None
                else jnp.asarray(cloud.rerand.astype(np.int32))),
    )


def const_test_vector(params: TfheParams, value: int, msize: int) -> np.ndarray:
    """Test vector for the sign bootstrap: all coefficients = mu, giving
    +-mu depending on the sign of the phase (binarize_int/unbinarize_int,
    lib/BinOps_enc.cpp:182-192)."""
    mu = int(mod_switch_to_torus32(value, msize))
    return np.full(params.N, mu, dtype=np.int32)


def function_test_vector(params: TfheParams, fn: Callable[[np.ndarray], np.ndarray],
                         msize: int) -> np.ndarray:
    """Programmable test vector: output value fn(v) for input value v, where v
    ranges over the message space.  fn must satisfy the negacyclic constraint
    fn(v + msize/2) = -fn(v); inputs are assumed confined accordingly.

    Coefficient j of the test vector holds the output for phases that
    mod-switch to j, i.e. input value v ~= j * msize / (2N).
    """
    N, msz = params.N, msize
    j = np.arange(N)
    # input value represented by rotation j (phase j / 2N)
    v = np.round(j * msz / (2 * N)).astype(np.int64)
    out = fn(v)
    return mod_switch_to_torus32(np.asarray(out), msz).astype(np.int32)


# --------------------------------------------------------------------------- #
# Device implementation                                                       #
# --------------------------------------------------------------------------- #


def gadget_offset(p: TfheParams) -> int:
    """TFHE v1.1 signed-decomposition offset: sum_j (Bg/2) * 2^(32-(j+1)*Bgbit)
    (tfhe v1.1 tgsw.cpp TorusPolynomialDecompH / its precomputed params->offset).
    Adding it makes each masked bit-field a balanced digit after subtracting
    Bg/2; the reconstruction error is one-sided floor truncation in
    [0, 2^(32 - l*Bgbit)) — pinned by tests/test_tfhe_conventions.py."""
    off = 0
    for j in range(p.l):
        off = (off + ((p.bg // 2) << (32 - (j + 1) * p.bg_bit))) & 0xFFFFFFFF
    return off


def gadget_decompose_np(p: TfheParams, x: np.ndarray) -> np.ndarray:
    """NumPy reference of the device decompose (make_bootstrap_impl): torus
    int32 [...] -> balanced digits [..., l] in [-Bg/2, Bg/2)."""
    shifts = np.array([32 - (j + 1) * p.bg_bit for j in range(p.l)], np.uint32)
    u = x.astype(np.uint32) + np.uint32(gadget_offset(p))
    d = (u[..., None] >> shifts) & np.uint32(p.bg - 1)
    return d.astype(np.int32) - np.int32(p.bg // 2)


class RoundOps:
    """Per-round primitives shared by the single-device bootstrap impl and
    the polynomial-sharded impl (parallel/ntt_shard.py): mod-switch,
    negacyclic rotate, gadget decompose, sample extract, key switch.

    Hoisted out of ``make_bootstrap_impl`` so poly-sharded evaluation reuses
    the exact same (tested) conventions instead of re-deriving them."""

    def __init__(self, p: TfheParams):
        self.p = p
        N, n, l, bg_bit = p.N, p.n, p.l, p.bg_bit
        self._two_n = 2 * N
        self._ms_shift = 32 - p.log2_2N
        self._offset = gadget_offset(p)
        self._mask_mod = p.bg - 1
        self._dec_shifts = np.array(
            [32 - (j + 1) * bg_bit for j in range(l)], dtype=np.uint32
        )
        # digits fit int8 whenever Bg <= 2^8: materializing them narrow
        # quarters the largest intra-round intermediate ([B, rows, N])
        self._digit_dtype = jnp.int8 if p.half_bg <= 127 else jnp.int32
        # radix 4 measured fastest on the TPU backend (sweep-2,
        # results/tpu_perf_sweep2.log: 832/s vs 660/s radix-2 same-day);
        # radix 16 hits a lowering cliff (128/s) — don't go above 8
        self._rot_radix = int(os.environ.get("REDSEC_ROT_RADIX", "4"))
        self._rot_mode = os.environ.get("REDSEC_ROT_MODE", "select")
        self._ks_shifts = np.array(
            [32 - (j + 1) * p.ks_basebit for j in range(p.ks_t)], dtype=np.uint32
        )
        # rounding offset = half the KS truncation step; a full-precision
        # KS (basebit*t >= 32, e.g. medium_v2/large_v2's exact 2x16) has no
        # truncation and therefore no offset
        kbits = p.ks_basebit * p.ks_t
        self._prec_offset = (1 << (32 - 1 - kbits)) if kbits < 32 else 0

    def mod_switch(self, x):
        u = x.astype(jnp.uint32)
        u = (u + np.uint32(1 << (self._ms_shift - 1))) >> np.uint32(self._ms_shift)
        return (u & np.uint32(self._two_n - 1)).astype(jnp.int32)

    def _shift_neg(self, out, s):
        """X^s * out for static s in [0, 2N)."""
        N = self.p.N
        s = s % (2 * N)
        neg, s = (s >= N), s % N
        if s:
            r = jnp.concatenate([-out[..., N - s:], out[..., : N - s]], axis=-1)
        else:
            r = out
        return -r if neg else r

    def rotate(self, polys, t):
        """X^t * poly (negacyclic) for per-batch exponents t [B] in [0, 2N).

        Two formulations (REDSEC_ROT_MODE):
        - "select" (default): digit-decomposed static shifts with per-batch
          selects (radix REDSEC_ROT_RADIX, default 2: log2(2N) stages).
          Fewer, wider stages (radix 4-16) trade copies for HBM passes.
        - "gather": one take_along_axis with per-batch source indices and a
          sign mask — a single pass over the data, if the backend lowers the
          batched gather well.
        The rotate+decompose chain is ~70% of in-context round time on the
        current backend (ablation numbers in PERFORMANCE.md)."""
        if self._rot_mode == "gather":
            return self._rotate_gather(polys, t)
        out = polys
        bits_per = max(1, self._rot_radix.bit_length() - 1)
        k = 0
        while k < self.p.log2_2N:
            nb = min(bits_per, self.p.log2_2N - k)
            d = (t >> k) & ((1 << nb) - 1)
            d = d.reshape(-1, *([1] * (polys.ndim - 1)))
            r = out
            for c in range(1, 1 << nb):
                r = jnp.where(d == c, self._shift_neg(out, c << k), r)
            out = r
            k += nb
        return out

    def _rotate_gather(self, polys, t):
        """out[..., j] = sign(j-t) * polys[..., (j-t) mod N] in one gather."""
        N = self.p.N
        j = jnp.arange(N, dtype=jnp.int32)
        src = (j[None, :] - t[:, None].astype(jnp.int32)) % np.int32(2 * N)
        sign = jnp.where(src >= N, np.int32(-1), np.int32(1))  # [B, N]
        idx = src % np.int32(N)
        shape = [polys.shape[0]] + [1] * (polys.ndim - 2) + [N]
        idx = idx.reshape(shape)
        sign = sign.reshape(shape)
        out = jnp.take_along_axis(
            polys, jnp.broadcast_to(idx, polys.shape), axis=-1)
        return out * sign

    def decompose(self, x):
        """TFHE signed gadget decomposition (tGswTorus32PolynomialDecompH):
        x [B, 2, N] torus -> digits [B, rows, N] in [-Bg/2, Bg/2)."""
        u = x.astype(jnp.uint32) + np.uint32(self._offset)
        d = (u[:, :, None, :] >> self._dec_shifts[None, None, :, None]) \
            & np.uint32(self._mask_mod)
        d = d.astype(jnp.int32) - np.int32(self.p.half_bg)
        return d.reshape(x.shape[0], self.p.decomp_rows, self.p.N).astype(
            self._digit_dtype)

    def sample_extract(self, acc):
        a_poly = acc[:, 0, :]
        a_ext = jnp.concatenate([a_poly[:, :1], -a_poly[:, :0:-1]], axis=-1)
        b_ext = acc[:, 1, 0]
        return a_ext, b_ext

    def ks_digits(self, a_n):
        """Key-switch digit decomposition: [B, N] -> int8 [B, N*t]."""
        u = a_n.astype(jnp.uint32) + np.uint32(self._prec_offset)
        dig = (u[:, :, None] >> self._ks_shifts[None, None, :]) \
            & np.uint32(self.p.ks_base - 1)
        return dig.astype(jnp.int8).reshape(a_n.shape[0], -1)

    def key_switch(self, a_n, b_n, ksk_limbs):
        """Digit-decompose the extracted mask and subtract digit-scaled KSK
        rows: one [B, N*t] digit matrix x int8-limb-table matmul per limb on
        the MXU (multiply-form KSK, see keygen.make_keyswitch_key).
        Accumulation bound: N*t * 7 * 127 < 2^24 — exact in int32."""
        dig = self.ks_digits(a_n)
        ssum = None
        for i in range(4):
            part = jax.lax.dot_general(
                dig, ksk_limbs[i],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [B, n+1]
            part = part << (8 * i) if i else part
            ssum = part if ssum is None else ssum + part
        out = -ssum
        out = out.at[:, self.p.n].add(b_n)
        return out


def make_bootstrap_impl(p: TfheParams, plan: ntt_mod.NttPlan, unroll: int = 1,
                        bundle: int = 1):
    """Build the un-jitted batched PBS implementation:
    ``impl(bk_ntt, ksk_limbs, ct [B, n+1], testvect [N]|[B, N]) -> [B, n+1]``.

    The evaluation key is threaded as runtime arguments (NOT closure
    constants): baked-in constants blow up the serialized HLO by the key size
    (~330 MB), which breaks remote-compile backends and slows compilation.

    ``bundle=2`` evaluates the 2-bit bundled blind rotation (requires a key
    prepared from ``keygen(..., bundle=2)``; see DeviceCloudKey.bundle): n/2
    CMUX rounds, each applying X^(a_i*s_i + a_j*s_j) via the expansion
    acc + BK_i . D(u) + BK_j . D(v) + BK_ij . D(w) with u = rot(acc,a_i)-acc,
    v = rot(acc,a_j)-acc, w = rot(u,a_j)-u — 1.5x the rotate/NTT/pointwise
    work of two plain rounds, but HALF the sequential rounds, inverse NTTs,
    CRT recombinations and accumulator carries.
    """
    N, n = p.N, p.n
    two_n = 2 * N
    rows = p.decomp_rows
    half_bg = p.half_bg
    # In-context stage ablation for profiling (results become WRONG):
    # REDSEC_ABLATE=rotate|extprod|pointwise|intt|ks — see scripts/
    # profile_bootstrap.py. Stubs are shape-preserving and fold-resistant so
    # the remaining stages keep their real cost.
    ablate = os.environ.get("REDSEC_ABLATE", "")

    if bundle == 2:
        if plan is None:
            raise ValueError(
                "bundle=2 requires an NTT plan (the conv-schoolbook path for "
                "medium/large parameter sets runs unbundled)")
        if n % 2:
            raise ValueError(f"bundle=2 needs even n, got {n}")

    primes = plan.primes if plan is not None else ()

    ops = RoundOps(p)
    mod_switch, rotate, decompose = ops.mod_switch, ops.rotate, ops.decompose
    sample_extract, key_switch = ops.sample_extract, ops.key_switch

    def external_delta_schoolbook(diff, k_round):
        """Exact schoolbook external product as one int8 convolution (for
        parameter sets without NTT primes): digits' [-d|d] extension split
        into 8-bit limbs correlates against reversed-tap BK limbs; int32
        accumulation is exact (rows*N*128^2 < 2^31) and limb recombination
        wraps mod 2^32 — bit-identical to the NTT path.

        diff [B, 2, N] torus; k_round int8 [2*4, rows, N] -> delta [B, 2, N].
        """
        digits = decompose(diff).astype(jnp.int32)  # [B, rows, N]
        ext = jnp.concatenate([-digits, digits], axis=-1)  # [B, rows, 2N]
        dl_count = 1 if half_bg <= 128 else 2
        cur, dlimbs = ext, []
        for _ in range(dl_count - 1):
            lo = ((cur + np.int32(128)) & np.int32(255)) - np.int32(128)
            dlimbs.append(lo)
            cur = (cur - lo) >> np.int32(8)
        dlimbs.append(cur)
        x = jnp.stack(dlimbs, axis=1).astype(jnp.int8)  # [B, dl, rows, 2N]
        bsz = x.shape[0]
        x = x.reshape(bsz * dl_count, rows, 2 * N)
        out = jax.lax.conv_general_dilated(
            x, k_round, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.int32,
        )[..., 1:].reshape(bsz, dl_count, 2, BK_LIMBS, N)
        delta = []
        for u in range(2):
            accum = None
            for dl in range(dl_count):
                for bl in range(BK_LIMBS):
                    if dl + bl >= 4:
                        continue  # contributes a multiple of 2^32
                    v = out[:, dl, u, bl, :]
                    v = v << np.int32(8 * (dl + bl)) if dl + bl else v
                    accum = v if accum is None else accum + v
            delta.append(accum)
        return jnp.stack(delta, axis=1)

    # Pointwise default pairs with the NTT flavor: the matmul NTT's output
    # layout fuses well with the GEMM contraction (310/s vs 147/s for
    # matmul+lazy at batch 256 on v5e); the radix-2 NTT prefers the fused
    # elementwise reduction (321/s) — but only while the lazy path's int32
    # headroom covers the contraction in <= 2 passes ("auto": see
    # lazy_pointwise_passes / pointwise_is_gemm above for the per-prime
    # switch and the n2048 / bundled anomaly it fixes).
    pointwise_mode = os.environ.get(
        "REDSEC_POINTWISE", "gemm" if _use_matmul_ntt(p.N) else "auto"
    )
    _contract_rows = (3 if bundle == 2 else 1) * rows

    def _pointwise_is_gemm(prime: int) -> bool:
        return pointwise_is_gemm(pointwise_mode, prime, _contract_rows)

    # Whole-blind-rotation mega-kernel (pallas_blind.py): all n rounds in one
    # pallas_call, accumulator VMEM-resident, BK streamed as int16 slices.
    blind_kernel = None
    if bundle == 1 and _use_blind_kernel(p, plan):
        from . import pallas_blind

        _bt = int(os.environ.get("REDSEC_BLIND_TILE", "64"))
        if _bt > 64:
            # supported envelope: tile 128's VMEM working set (tile x rows x
            # 2 primes x N int32 intermediates) exceeds the 16 MB/core VMEM
            # budget and crashed the worker when measured (PERFORMANCE.md,
            # results/tpu_perf_sweep3.log 14:58) — reject instead of crash
            raise ValueError(
                f"REDSEC_BLIND_TILE={_bt} is outside the kernel's supported "
                "envelope (max 64): the per-tile VMEM working set exceeds "
                "the 16 MB budget and kills the device worker")
        blind_kernel = pallas_blind.make_blind_rotate_kernel(
            p, plan, tile=_bt,
            interpret=jax.default_backend() == "cpu",
        )

    # Fused Pallas round kernel: NTT -> pointwise -> INTT -> CRT in VMEM.
    # Opt-in (REDSEC_ROUND_KERNEL=1|partial): measured 2x slower than the XLA
    # formulation at tile 8 on v5e and compile-bound at tile 32 on the
    # remote-compile backend; kept for round-2 tuning (see PERFORMANCE.md).
    _rk_env = os.environ.get("REDSEC_ROUND_KERNEL", "0")
    use_round_kernel = (
        _rk_env != "0"
        and bundle == 1
        and plan is not None
        and _use_matmul_ntt(p.N)  # kernel tables use the four-step ordering
        and len(plan.primes) == 2
        and ntt_matmul.supported(p.N)
        and ntt_matmul._split_rc(p.N)[1] == 128
    )
    round_kernel = None
    full_round = None
    if use_round_kernel:
        from .pallas_round import make_full_round_kernel, make_round_kernel

        _tile = int(os.environ.get("REDSEC_ROUND_TILE", "8"))
        _interp = jax.default_backend() == "cpu"
        if _rk_env == "partial":
            round_kernel = make_round_kernel(p, plan, tile=_tile, interpret=_interp)
        else:
            full_round = make_full_round_kernel(p, plan, tile=_tile, interpret=_interp)

    def _pointwise_rows_lazy(dn, bki, prime):
        """sum_j dn[b, j, n] * bk[j, o, l, n] mod p, elementwise with lazy
        int32 accumulation — keeps N in the minor (lane) dimension throughout;
        XLA fuses the multiply into the row reduction."""
        n_rows = dn.shape[1]
        group = max(1, (2**31 - 1) // ((prime - 1) ** 2))
        partials = None
        for g0 in range(0, n_rows, group):
            g1 = min(g0 + group, n_rows)
            raw = (
                dn[:, g0:g1, None, None, :] * bki[None, g0:g1, :, :, :]
            ).sum(axis=1)  # [B, 2, limbs, N] < group * p^2 <= int32
            red = ntt_mod._reduce_int32(raw, prime)
            partials = red if partials is None else partials + red
        return ntt_mod._reduce_small(partials, prime)

    def _pointwise_rows_gemm(dn, bki, prime):
        """Same contraction as N-batched bf16 matmuls (MXU); pays N-major
        transposes — only wins when rows is large."""
        bk_flat = bki.reshape(dn.shape[1], 2 * BK_LIMBS, N)

        def bmm(l, r):
            out = jax.lax.dot_general(
                l, r, dimension_numbers=(((1,), (0,)), ((2,), (2,))),
                preferred_element_type=jnp.float32,
            )  # [N, B, 2*limbs]
            return out.astype(jnp.int32)

        d_lo = (dn & 255).astype(jnp.bfloat16)
        d_hi = (dn >> 8).astype(jnp.bfloat16)
        b_lo = (bk_flat & 255).astype(jnp.bfloat16)
        b_hi = (bk_flat >> 8).astype(jnp.bfloat16)
        p00 = bmm(d_lo, b_lo)
        r_mid = ntt_mod._reduce_int32(bmm(d_lo, b_hi) + bmm(d_hi, b_lo), prime)
        r_hi = ntt_mod._reduce_int32(bmm(d_hi, b_hi), prime)
        r_hi_t = ntt_mod._mulmod_device(
            r_hi, jnp.full((), np.int32((1 << 16) % prime), jnp.int32), prime
        )
        s = ntt_mod._reduce_int32(p00 + (r_mid << 8) + r_hi_t, prime)
        s = jnp.transpose(s, (1, 2, 0))  # [B, 2*limbs, N]
        return s.reshape(-1, 2, BK_LIMBS, N)

    def external_delta(digits, bk_round):
        """TGSW external product: digits [B, R, N] x BK rows -> torus delta
        [B, 2, N].  R = rows for a plain round, 3*rows for a bundled round
        (the contraction over R sums all three TGSW products at once).
        digits stay int8 across the fusion boundary (4x smaller shared
        intermediate); each prime branch widens inside its own fusion."""
        if round_kernel is not None:
            digits = digits.astype(jnp.int32)
            bk_i32 = jnp.stack(
                [bk_round[pi].astype(jnp.int32).reshape(rows, 2 * BK_LIMBS, N)
                 for pi in range(len(primes))]
            )
            return round_kernel(digits, bk_i32)
        # REDSEC_NARROW=1: materialize the NTT-domain intermediates (values
        # < prime < 2^15) as uint16 at the fusion boundaries — halves the
        # HBM bytes of the two largest per-round tensors (dn [B, rows, N]
        # and the pointwise output [B, 2, limbs, N]) on a path whose
        # throughput tracks memory passes (PERFORMANCE.md: bundle-sweep
        # pass-floor result).  An optimization_barrier pins the narrow
        # dtype at the boundary (a bare convert pair could fuse to either
        # side and change nothing); widening happens inside the consumer's
        # fusion; exactness is unaffected (residues in [0, prime)).
        narrow = os.environ.get("REDSEC_NARROW", "0") == "1"

        def _narrow16(t):
            return jax.lax.optimization_barrier(
                t.astype(jnp.uint16)).astype(jnp.int32)
        conv = []  # per prime: [B, 2, limbs, N]
        for pi, prime in enumerate(primes):
            d32 = digits.astype(jnp.int32)
            dmod = d32 + np.int32(prime) * (d32 < 0).astype(jnp.int32)
            dn = _fwd_ntt(dmod, plan, pi)  # [B, rows, N]
            if narrow:
                dn = _narrow16(dn)
            bki = bk_round[pi].astype(jnp.int32)  # [rows, 2, limbs, N]
            if ablate == "pointwise":
                s = dn[:, : 2 * BK_LIMBS, :].reshape(-1, 2, BK_LIMBS, plan.N)
            elif _pointwise_is_gemm(prime):
                s = _pointwise_rows_gemm(dn, bki, prime)
            else:
                s = _pointwise_rows_lazy(dn, bki, prime)
            if ablate == "intt":
                conv.append(s)
                continue
            if narrow:
                s = _narrow16(s)
            conv.append(_inv_ntt(s, plan, pi))
        out = None
        for limb in range(BK_LIMBS):
            v = ntt_mod.crt_to_torus32([c[:, :, limb, :] for c in conv], plan)
            v = (v.astype(jnp.uint32) << np.uint32(BK_LIMB_BITS * limb)).astype(jnp.int32) if limb else v
            out = v if out is None else out + v
        return out

    def blind_rotate(abar, bbar, tv, bk_ntt):
        acc_b = rotate(tv, (two_n - bbar) % two_n)
        acc = jnp.stack([jnp.zeros_like(acc_b), acc_b], axis=1)  # [B, 2, N]

        if blind_kernel is not None:
            # bk_ntt here is the packed int16 tensor [P, n, rows, 8, N]
            return blind_kernel(acc, abar, bk_ntt)

        if plan is None:  # conv-schoolbook path (no NTT primes for this N)
            bk_sb = bk_ntt[0]  # int8 [n, 8, rows, N]

            def body_sb(i, acc):
                ai = abar[:, i]
                rot = rotate(acc, ai)
                diff = rot - acc
                k_round = jax.lax.dynamic_index_in_dim(bk_sb, i, 0, keepdims=False)
                return acc + external_delta_schoolbook(diff, k_round)

            return jax.lax.fori_loop(0, n, body_sb, acc, unroll=unroll)

        def bk_slice(bk_ntt, i):
            return tuple(
                jax.lax.dynamic_index_in_dim(bk, i, axis=0, keepdims=False)
                for bk in bk_ntt
            )

        if bundle == 2:
            def body(i, acc):
                B = acc.shape[0]
                a2 = jax.lax.dynamic_slice_in_dim(abar, 2 * i, 2, axis=1)
                ai, aj = a2[:, 0], a2[:, 1]
                if ablate == "rotate":
                    # fold-resistant stub with the same shapes (see the plain
                    # body): profiling ablation, results become WRONG
                    u = acc * np.int32(3) - acc
                    v = acc * np.int32(5) - acc
                    w = u * np.int32(3) - u
                else:
                    # rot(acc, a_i) and rot(acc, a_j) in one doubled-batch
                    # rotate
                    both = rotate(
                        jnp.concatenate([acc, acc], axis=0),
                        jnp.concatenate([ai, aj], axis=0),
                    )
                    u = both[:B] - acc      # (X^ai - 1) acc
                    v = both[B:] - acc      # (X^aj - 1) acc
                    w = rotate(u, aj) - u   # (X^ai - 1)(X^aj - 1) acc
                diffs = jnp.stack([u, v, w], axis=1).reshape(3 * B, 2, N)
                digits = decompose(diffs).reshape(B, 3 * rows, N)
                if ablate == "extprod":
                    return acc + digits[:, :2, :].astype(jnp.int32)
                return acc + external_delta(digits, bk_slice(bk_ntt, i))

            return jax.lax.fori_loop(0, n // 2, body, acc, unroll=unroll)

        if full_round is not None:
            def body(i, acc):
                bk_i32 = jnp.stack(
                    [b.astype(jnp.int32).reshape(rows, 2 * BK_LIMBS, N)
                     for b in bk_slice(bk_ntt, i)]
                )
                return full_round(acc, abar[:, i], bk_i32)
        else:
            def body(i, acc):
                ai = abar[:, i]
                rot = acc * np.int32(3) if ablate == "rotate" else rotate(acc, ai)
                diff = rot - acc
                if ablate == "extprod":
                    digits = decompose(diff)
                    return acc + digits[:, :2, :].astype(jnp.int32)
                return acc + external_delta(decompose(diff), bk_slice(bk_ntt, i))

        return jax.lax.fori_loop(0, n, body, acc, unroll=unroll)

    def bootstrap_impl(bk_ntt, ksk_limbs, ct, testvect):
        abar = mod_switch(ct[:, :n])
        bbar = mod_switch(ct[:, n])
        tv = jnp.broadcast_to(
            jnp.asarray(testvect, dtype=jnp.int32).reshape(-1, N), (ct.shape[0], N)
        )
        acc = blind_rotate(abar, bbar, tv, bk_ntt)
        a_n, b_n = sample_extract(acc)
        if ablate == "ks":
            return jnp.concatenate([a_n[:, :n], b_n[:, None]], axis=1)
        return key_switch(a_n, b_n, ksk_limbs)

    return bootstrap_impl


def make_batched_bootstrap(dkey: DeviceCloudKey, unroll: int = 1):
    """Jitted batched PBS bound to a device key:
    ``(ct [B, n+1], testvect [N]|[B, N]) -> [B, n+1]``."""
    impl = make_bootstrap_impl(dkey.params, dkey.plan, unroll,
                               bundle=dkey.bundle)
    jitted = jax.jit(impl)
    key_arg = _key_material(dkey)

    def bootstrap(ct, testvect):
        return jitted(key_arg, dkey.ksk_limbs, ct, testvect)

    bootstrap.impl = impl  # for callers composing larger jits
    return bootstrap


def make_chunked_impl(p: TfheParams, plan: ntt_mod.NttPlan, chunk: int = 512,
                      bundle: int = 1):
    """Un-jitted chunked PBS: batches larger than ``chunk`` run as a
    ``lax.map`` over fixed-size slices (one compiled body, sequential) so
    arbitrarily large activation tensors — e.g. cifar/binarynet's 131k sign
    bootstraps in one layer — fit in HBM."""
    impl = make_bootstrap_impl(p, plan, bundle=bundle)
    N = p.N

    def run(bk_ntt, ksk_limbs, ct, testvect):
        m = ct.shape[0]
        if m <= chunk:
            return impl(bk_ntt, ksk_limbs, ct, testvect)
        tv = jnp.broadcast_to(
            jnp.asarray(testvect, dtype=jnp.int32).reshape(-1, N), (m, N)
        )
        pad = (-m) % chunk
        if pad:
            ct = jnp.concatenate([ct, jnp.zeros((pad, ct.shape[1]), ct.dtype)])
            tv = jnp.concatenate([tv, jnp.zeros((pad, N), tv.dtype)])
        nc = ct.shape[0] // chunk
        out = jax.lax.map(
            lambda args: impl(bk_ntt, ksk_limbs, *args),
            (ct.reshape(nc, chunk, -1), tv.reshape(nc, chunk, N)),
        )
        return out.reshape(nc * chunk, -1)[:m]

    return run


def make_chunked_bootstrap(dkey: DeviceCloudKey, chunk: int = 512):
    """Chunked PBS bound to a device key (jitted per batch shape)."""
    impl = make_chunked_impl(dkey.params, dkey.plan, chunk, bundle=dkey.bundle)
    jitted = jax.jit(impl)
    key_arg = _key_material(dkey)

    def run(ct, testvect):
        return jitted(key_arg, dkey.ksk_limbs, ct, testvect)

    run.impl = impl
    return run


# --------------------------------------------------------------------------- #
# Host reference (numpy, exact) — the test oracle for the device path         #
# --------------------------------------------------------------------------- #


def _rotate_host(poly: np.ndarray, t: int, N: int) -> np.ndarray:
    ext = np.concatenate([poly, -poly], axis=-1)
    j = np.arange(N)
    return ext[..., (j - t) % (2 * N)]


def bootstrap_host(cloud: CloudKey, ct: np.ndarray, testvect: np.ndarray) -> np.ndarray:
    """Single-sample reference bootstrap in numpy int64 (exact)."""
    p = cloud.params
    N, n, l, bg_bit = p.N, p.n, p.l, p.bg_bit
    plan = _bootstrap_plan(p)
    half_bg, mask = p.half_bg, p.bg - 1
    offset = gadget_offset(cloud.params)

    def mod_switch(x):
        u = np.int64(x) & 0xFFFFFFFF
        return int(((u + (1 << (31 - p.log2_2N))) >> (32 - p.log2_2N)) & (2 * N - 1))

    def decompose(x):
        u = (x.astype(np.int64) & 0xFFFFFFFF) + offset
        digs = []
        for j in range(l):
            digs.append(((u >> (32 - (j + 1) * bg_bit)) & mask) - half_bg)
        return np.stack(digs)  # [l, N]

    def poly_mul_torus(d, c):
        """digit poly x torus poly -> torus poly (exact via limbs + CRT;
        int64 schoolbook when the parameter set has no NTT primes)."""
        if plan is None:
            return ntt_mod.negacyclic_mul_host(d, c, N)
        c_u = c.astype(np.uint32)
        out = np.zeros(N, dtype=np.int64)
        for sh in range(0, 32, BK_LIMB_BITS):
            limb = ((c_u >> np.uint32(sh)) & np.uint32((1 << BK_LIMB_BITS) - 1)).astype(np.int64)
            residues = []
            for pi, prime in enumerate(plan.primes):
                yd = ntt_mod.ntt_host(d % prime, plan, pi)
                yl = ntt_mod.ntt_host(limb, plan, pi)
                residues.append(ntt_mod.intt_host(yd * yl % prime, plan, pi))
            out += _crt_host(residues, plan) << sh
        return out.astype(np.uint64).astype(np.uint32).astype(np.int32)

    abar = [mod_switch(v) for v in ct[:n]]
    bbar = mod_switch(ct[n])
    acc = np.stack(
        [np.zeros(N, dtype=np.int32), _rotate_host(testvect.astype(np.int32), (2 * N - bbar) % (2 * N), N)]
    )
    for i in range(n):
        rot = _rotate_host(acc, abar[i], N)
        diff = (rot - acc).astype(np.int32)
        delta = np.zeros((2, N), dtype=np.int32)
        for bloc in range(2):
            digs = decompose(diff[bloc])  # [l, N]
            for j in range(l):
                row = bloc * l + j
                for u in range(2):
                    delta[u] = (
                        delta[u] + poly_mul_torus(digs[j], cloud.bk[i, row, u])
                    ).astype(np.int32)
        acc = (acc + delta).astype(np.int32)

    a_ext = np.concatenate([acc[0, :1], -acc[0, :0:-1]]).astype(np.int32)
    b_ext = acc[1, 0]

    # key switch
    t, base, basebit = p.ks_t, p.ks_base, p.ks_basebit
    prec = (1 << (32 - 1 - basebit * t)) if basebit * t < 32 else 0
    out = np.zeros(n + 1, dtype=np.int32)
    out[n] = b_ext
    for i in range(N):
        u = (int(a_ext[i]) & 0xFFFFFFFF) + prec
        for j in range(t):
            dig = (u >> (32 - (j + 1) * basebit)) & (base - 1)
            # multiply-form KSK: subtract digit * ksk[i, j] (int32 wraparound)
            out = (out.astype(np.int64) - dig * cloud.ksk[i, j].astype(np.int64)).astype(np.int32)
    return out
