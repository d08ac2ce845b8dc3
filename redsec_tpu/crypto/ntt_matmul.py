"""Four-step NTT as MXU matmuls — the TPU-native transform.

The radix-2 butterfly NTT (ntt.py) is lane-layout-hostile on TPU: every stage
reshapes across the 128-lane dimension and XLA lowers the late stages to slow
relayouts (~measured 100x off VPU roofline).  The four-step factorization
N = R*C (32x32 for N=1024) turns the transform into

    pre-twist (negacyclic psi^j)  ->  C-many NTT_R     (matmul over rows)
    -> twiddle w^(j2*k1)          ->  R-many NTT_C     (matmul over cols)

where both NTT_R/NTT_C are contractions with constant [R,R]/[C,C] matrices —
exactly what the MXU does at full speed, batched over thousands of
polynomials, with zero cross-lane data movement.

Exactness: operands are split into 8-bit limbs, each exactly representable in
bf16; bf16 x bf16 -> fp32 matmuls of 8-bit integers are exact (products
< 2^16, sums of 32 < 2^21 < 2^24), and limb recombination is reduced mod p
in int32 before it can overflow.

Output order is the four-step [k1, k2] matrix order — internally consistent
(BK is transformed with the same functions), which is all pointwise products
need.  The inverse consumes that order and emits natural order.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ntt import NttPlan, _reduce_int32, _mulmod_device


def _split_rc(N: int):
    """Factor N = R*C with C = 128 (the TPU lane width) when possible.

    Keeping the minor dimension at 128 makes every intermediate lane-native
    (a [.., R, 128] view of [.., N] is a free row-major split), and the
    C-side transform becomes a [.., 128] x [128, 128] MXU matmul at full
    utilization.  A sqrt-balanced split (e.g. 32x32) leaves the minor dim at
    32 -> 4x lane padding and relayouts everywhere.
    """
    C = 128 if N >= 256 else max(16, N // 16)
    return N // C, C


@functools.lru_cache(maxsize=None)
def _mm_tables(N: int, p: int, g_psi: Tuple[int, int]) -> dict:
    """Precompute four-step tables mod p; psi = primitive 2N-th root."""
    psi, w = g_psi  # psi: 2N-th root; w = psi^2: N-th root
    R, C = _split_rc(N)
    assert R * C == N
    wR = pow(w, C, p)  # order R
    wC = pow(w, R, p)  # order C

    def mat(root, dim, inv=False):
        e = np.arange(dim)
        exp = np.outer(e, e) % dim
        base = pow(root, p - 2, p) if inv else root
        vals = [1]
        for i in range(1, dim):
            vals.append(vals[-1] * base % p)
        vals = np.array(vals, dtype=np.int64)
        return vals[exp]

    j1 = np.arange(R)[:, None]
    j2 = np.arange(C)[None, :]
    jflat = j1 * C + j2
    psi_pows = np.array([pow(psi, int(j), p) for j in range(N)], dtype=np.int64)
    psi_inv = pow(psi, 2 * N - 1, p)  # psi^-1
    psin_pows = np.array([pow(psi_inv, int(j), p) for j in range(N)], dtype=np.int64)
    ninv = pow(N, p - 2, p)
    w_inv = pow(w, p - 2, p)
    tw = np.zeros((R, C), dtype=np.int64)
    twi = np.zeros((R, C), dtype=np.int64)
    for k1 in range(R):
        for jj2 in range(C):
            tw[k1, jj2] = pow(w, k1 * jj2, p)
            twi[k1, jj2] = pow(w_inv, k1 * jj2, p)
    return {
        "R": R, "C": C,
        "WR": mat(wR, R),            # [k1, j1]
        "WC": mat(wC, C),            # [j2, k2] (symmetric)
        "WRi": mat(wR, R, inv=True),
        "WCi": mat(wC, C, inv=True),
        "TW": tw, "TWi": twi,
        "twist": psi_pows[jflat],    # [R, C]
        "untwist": (psin_pows[jflat] * ninv) % p,
    }


def _tables_for(plan: NttPlan, pi: int) -> dict:
    p = plan.primes[pi]
    # recover psi from the plan's twist table (twist[1] = psi)
    psi = int(plan.twist[pi][1])
    w = psi * psi % p
    return _mm_tables(plan.N, p, (psi, w))


def _limbs_bf16(x):
    lo = (x & 255).astype(jnp.bfloat16)
    hi = (x >> 8).astype(jnp.bfloat16)
    return lo, hi


def _w_limbs(w: np.ndarray):
    w = w.astype(np.int64)
    return (
        jnp.asarray((w & 255).astype(np.float32), dtype=jnp.bfloat16),
        jnp.asarray((w >> 8).astype(np.float32), dtype=jnp.bfloat16),
    )


def _exact_matmul_mod(data, w: np.ndarray, p: int, side: str):
    """(data [B?, R, C] int32 in [0,p)) x (constant matrix mod p) -> mod p.

    side='left':  out[.., i, c] = sum_j w[i, j] * data[.., j, c]
    side='right': out[.., r, k] = sum_j data[.., r, j] * w[j, k]
    Exact via 8-bit limbs in bf16 matmuls with fp32 accumulation.
    """
    d_lo, d_hi = _limbs_bf16(data)
    w_lo, w_hi = _w_limbs(w)

    if side == "left":
        def mm(a, b):  # w-part a [R,R], data-part b [B, R, C]
            out = jax.lax.dot_general(a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            # out [R, B, C] -> [B, R, C]
            return jnp.moveaxis(out, 0, 1)
    else:
        def mm(a, b):  # data-part b [B, R, C], w-part a [C, C]
            out = jax.lax.dot_general(b, a, dimension_numbers=(((2,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            return out  # [B, R, C]

    p00 = mm(w_lo, d_lo).astype(jnp.int32)
    p01 = mm(w_lo, d_hi).astype(jnp.int32)
    p10 = mm(w_hi, d_lo).astype(jnp.int32)
    p11 = mm(w_hi, d_hi).astype(jnp.int32)
    r_mid = _reduce_int32(p01 + p10, p)
    r_hi = _reduce_int32(p11, p)
    # r_hi * 2^16 may exceed int32 for p > 2^15; fold the shift into a mulmod
    r_hi_t = _mulmod_device(r_hi, jnp.full((), np.int32((1 << 16) % p), jnp.int32), p)
    v = p00 + (r_mid << 8) + r_hi_t  # < ~2^23 + ~2^24 + p, well inside int32
    return _reduce_int32(v, p)


def ntt_device_mm(x, plan: NttPlan, pi: int):
    """Negacyclic forward NTT (four-step order); x int32 [..., N] in [0, p)."""
    p = plan.primes[pi]
    t = _tables_for(plan, pi)
    R, C = t["R"], t["C"]
    shape = x.shape
    m = x.reshape(-1, R, C)
    m = _mulmod_device(m, jnp.asarray(t["twist"], jnp.int32)[None], p)
    a = _exact_matmul_mod(m, t["WR"], p, "left")   # [B, k1, j2]
    a = _mulmod_device(a, jnp.asarray(t["TW"], jnp.int32)[None], p)
    z = _exact_matmul_mod(a, t["WC"], p, "right")  # [B, k1, k2]
    return z.reshape(shape)


def intt_device_mm(y, plan: NttPlan, pi: int):
    """Inverse (consumes four-step order, emits natural coefficient order)."""
    p = plan.primes[pi]
    t = _tables_for(plan, pi)
    R, C = t["R"], t["C"]
    shape = y.shape
    m = y.reshape(-1, R, C)  # [B, k1, k2]
    b = _exact_matmul_mod(m, t["WCi"], p, "right")  # sum over k2 -> [B, k1, j2]
    b = _mulmod_device(b, jnp.asarray(t["TWi"], jnp.int32)[None], p)
    x = _exact_matmul_mod(b, t["WRi"], p, "left")   # sum over k1 -> [B, j1, j2]
    x = _mulmod_device(x, jnp.asarray(t["untwist"], jnp.int32)[None], p)
    return x.reshape(shape)


def supported(N: int) -> bool:
    R, C = _split_rc(N)
    return R * C == N and R >= 2
