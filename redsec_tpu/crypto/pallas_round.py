"""Fused Pallas kernel for the CMUX external product (the bootstrap hot loop).

One kernel per blind-rotation round computes, entirely VMEM-resident per
batch tile:

    digits --fwd NTT (2 primes)--> pointwise x BK --inv NTT--> CRT -> delta

The XLA formulation streams ~0.5 GB of intermediates through HBM per round
and splinters into dozens of kernels; this kernel's HBM traffic is just
digits in (21 MB at batch 256) + the round's BK slice (1.3 MB) + delta out
(2 MB).

Layout: everything is viewed as [.., R, 128] with R = N/128 — the native TPU
tile — so reshapes never move the lane dimension.  The R-side DFT uses
scalar twiddles from SMEM (R^2 fused multiply-accumulates); the 128-side DFT
is a [.., 128] x [128, 128] MXU matmul, exact via 8-bit limbs in bf16
(crypto/ntt_matmul.py's argument).  All modular arithmetic is the same
int32 + fp32-reciprocal reduction as the XLA path, so results are bit-exact.

Enabled with REDSEC_ROUND_KERNEL=1 (off by default: the XLA formulation
stays the default per the keep-or-cut policy, PERFORMANCE.md — this
backend's Mosaic lowering runs ~3x below its XLA fusions).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ntt_matmul
from .ntt import NttPlan
from .params import TfheParams

BK_LIMBS = 4
BK_LIMB_BITS = 8


def _mulmod(a, b, p: int):
    prod = a * b
    q = jnp.floor(a.astype(jnp.float32) * b.astype(jnp.float32) * np.float32(1.0 / p))
    r = prod - q.astype(jnp.int32) * np.int32(p)
    r = jnp.where(r < 0, r + p, r)
    return jnp.where(r >= p, r - p, r)


def _reduce(x, p: int):
    q = jnp.floor(x.astype(jnp.float32) * np.float32(1.0 / p)).astype(jnp.int32)
    r = x - q * np.int32(p)
    r = jnp.where(r < 0, r + p, r)
    return jnp.where(r >= p, r - p, r)


def _exact_dot_mod(a, w_lo, w_hi, p: int):
    """[M, 128] int32 in [0,p) @ [128, 128] table mod p — exact bf16 limbs."""
    a_lo = (a & 255).astype(jnp.bfloat16)
    a_hi = (a >> 8).astype(jnp.bfloat16)
    p00 = jnp.dot(a_lo, w_lo, preferred_element_type=jnp.float32).astype(jnp.int32)
    p01 = jnp.dot(a_lo, w_hi, preferred_element_type=jnp.float32).astype(jnp.int32)
    p10 = jnp.dot(a_hi, w_lo, preferred_element_type=jnp.float32).astype(jnp.int32)
    p11 = jnp.dot(a_hi, w_hi, preferred_element_type=jnp.float32).astype(jnp.int32)
    r_mid = _reduce(p01 + p10, p)
    r_hi = _mulmod(_reduce(p11, p), jnp.int32((1 << 16) % p), p)
    return _reduce(p00 + (r_mid << 8) + r_hi, p)


def _round_tables(params: TfheParams, plan: NttPlan):
    """Numpy tables for the kernel inputs (per prime)."""
    tabs = []
    for pi, p in enumerate(plan.primes):
        t = ntt_matmul._tables_for(plan, pi)
        R, C = t["R"], t["C"]
        assert C == 128, "round kernel requires the lane-native (R,128) split"
        w16 = lambda m: (  # noqa: E731
            (m.astype(np.int64) & 255).astype(np.float32),
            (m.astype(np.int64) >> 8).astype(np.float32),
        )
        wc_lo, wc_hi = w16(t["WC"])
        wci_lo, wci_hi = w16(t["WCi"])
        tabs.append({
            "R": R,
            "twist": t["twist"].astype(np.int32),      # [R,128]
            "untwist": t["untwist"].astype(np.int32),  # [R,128]
            "TW": t["TW"].astype(np.int32),            # [R,128]
            "TWi": t["TWi"].astype(np.int32),
            "WR": t["WR"].astype(np.int32),            # [R,R]
            "WRi": t["WRi"].astype(np.int32),
            "WC": (wc_lo, wc_hi),                      # bf16-able [128,128]
            "WCi": (wci_lo, wci_hi),
        })
    return tabs


def make_round_kernel(params: TfheParams, plan: NttPlan, tile: int = 32,
                      interpret: bool = False):
    """Build fn(digits [M, rows, N] int32, bk int32 [P, rows, 8, N]) ->
    delta [M, 2, N] torus int32."""
    primes = plan.primes
    P = len(primes)
    rows = params.decomp_rows
    N = params.N
    tabs = _round_tables(params, plan)
    R = tabs[0]["R"]
    # CRT constants (2-prime Garner; matches ntt.crt_to_torus32)
    assert P == 2, "round kernel currently supports the 2-prime configuration"
    p0, p1 = primes
    inv01 = pow(p0 % p1, p1 - 2, p1)
    Pm32 = (p0 * p1) & 0xFFFFFFFF
    Pm32 = Pm32 - (1 << 32) if Pm32 >= (1 << 31) else Pm32

    def ntt_fwd_tile(x, pi, tw_r, wr_ref, twd, wc_lo, wc_hi):
        """x [Q, R, 128] in [0,p) -> four-step NTT, same map as ntt_device_mm."""
        p = primes[pi]
        x = _mulmod(x, tw_r[None], p)
        outs = []
        for k1 in range(R):
            acc = None
            for j1 in range(R):
                t = _mulmod(x[:, j1, :], wr_ref[pi, k1, j1], p)  # SMEM scalar
                acc = t if acc is None else acc + t
            outs.append(_reduce(acc, p))
        a = jnp.stack(outs, axis=1)  # [Q, R, 128]
        a = _mulmod(a, twd[None], p)
        z = _exact_dot_mod(a.reshape(-1, 128), wc_lo, wc_hi, p)
        return z.reshape(-1, R, 128)

    def ntt_inv_tile(y, pi, un_r, wri_ref, twdi, wci_lo, wci_hi):
        p = primes[pi]
        b = _exact_dot_mod(y.reshape(-1, 128), wci_lo, wci_hi, p).reshape(-1, R, 128)
        b = _mulmod(b, twdi[None], p)
        outs = []
        for j1 in range(R):
            acc = None
            for k1 in range(R):
                t = _mulmod(b[:, k1, :], wri_ref[pi, j1, k1], p)  # SMEM scalar
                acc = t if acc is None else acc + t
            outs.append(_reduce(acc, p))
        x = jnp.stack(outs, axis=1)
        return _mulmod(x, un_r[None], p)

    def kernel(dig_ref, bk_ref, tw_ref, un_ref, twd_ref, twdi_ref,
               wc_lo_ref, wc_hi_ref, wci_lo_ref, wci_hi_ref,
               wr_ref, wri_ref, out_ref):
        digits = dig_ref[:]  # [T, rows, N]
        T = digits.shape[0]
        convs = []
        for pi, p in enumerate(primes):
            dmod = digits + np.int32(p) * (digits < 0).astype(jnp.int32)
            v = dmod.reshape(T * rows, R, 128)
            wc_lo = wc_lo_ref[pi].astype(jnp.bfloat16)
            wc_hi = wc_hi_ref[pi].astype(jnp.bfloat16)
            dn = ntt_fwd_tile(v, pi, tw_ref[pi], wr_ref, twd_ref[pi],
                              wc_lo, wc_hi)
            dn = dn.reshape(T, rows, N)
            # pointwise with lazy accumulation
            group = max(1, (2**31 - 1) // ((p - 1) ** 2))
            souts = []
            for ol in range(2 * BK_LIMBS):
                total = None
                acc = None
                cnt = 0
                for j in range(rows):
                    prod = dn[:, j, :] * bk_ref[pi, j, ol, :][None, :]
                    acc = prod if acc is None else acc + prod
                    cnt += 1
                    if cnt == group or j == rows - 1:
                        red = _reduce(acc, p)
                        total = red if total is None else total + red
                        acc, cnt = None, 0
                souts.append(_reduce(total, p))
            s = jnp.stack(souts, axis=1)  # [T, 8, N]
            wci_lo = wci_lo_ref[pi].astype(jnp.bfloat16)
            wci_hi = wci_hi_ref[pi].astype(jnp.bfloat16)
            conv = ntt_inv_tile(s.reshape(T * 2 * BK_LIMBS, R, 128), pi,
                                un_ref[pi], wri_ref, twdi_ref[pi],
                                wci_lo, wci_hi)
            convs.append(conv.reshape(T, 2 * BK_LIMBS, N))
        # CRT (Garner, 2 primes) + sign correction + limb recombination
        c0, c1 = convs
        diffc = c1 - _reduce(c0, p1)
        diffc = jnp.where(diffc < 0, diffc + p1, diffc)
        t1 = _mulmod(diffc, jnp.int32(inv01), p1)
        vraw = c0 + t1 * np.int32(p0)  # < p0*p1 < 2^31
        frac = (c0.astype(jnp.float32) * np.float32(1.0 / (p0 * p1))
                + t1.astype(jnp.float32) * np.float32(1.0 / p1))
        v = vraw - jnp.where(frac >= 0.5, np.int32(Pm32), np.int32(0))
        # limb recombination: delta[out] = sum_l v[out*4+l] << 8l (int32 wrap)
        delta = []
        for o in range(2):
            accum = v[:, o * BK_LIMBS, :]
            for l in range(1, BK_LIMBS):
                accum = accum + v[:, o * BK_LIMBS + l, :] * np.int32(1 << (8 * l))
            delta.append(accum)
        out_ref[:] = jnp.stack(delta, axis=1)  # [T, 2, N]

    n_tabs = len(primes)
    tw = np.stack([t["twist"] for t in tabs])
    un = np.stack([t["untwist"] for t in tabs])
    twd = np.stack([t["TW"] for t in tabs])
    twdi = np.stack([t["TWi"] for t in tabs])
    wc_lo = np.stack([t["WC"][0] for t in tabs])
    wc_hi = np.stack([t["WC"][1] for t in tabs])
    wci_lo = np.stack([t["WCi"][0] for t in tabs])
    wci_hi = np.stack([t["WCi"][1] for t in tabs])
    wr = np.stack([t["WR"] for t in tabs])
    wri = np.stack([t["WRi"] for t in tabs])

    table_args = (tw, un, twd, twdi, wc_lo, wc_hi, wci_lo, wci_hi, wr, wri)
    table_specs = [
        pl.BlockSpec((n_tabs, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),  # tw
        pl.BlockSpec((n_tabs, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),  # un
        pl.BlockSpec((n_tabs, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),  # twd
        pl.BlockSpec((n_tabs, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),  # twdi
        pl.BlockSpec((n_tabs, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, R, R), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((n_tabs, R, R), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
    ]

    def run(digits, bk_round):
        """digits [M, rows, N] int32 (signed decomposition);
        bk_round int32 [P, rows, 8, N] -> delta [M, 2, N]."""
        m = digits.shape[0]
        pad = (-m) % tile
        if pad:
            digits = jnp.concatenate(
                [digits, jnp.zeros((pad, rows, N), jnp.int32)], axis=0
            )
        grid = (digits.shape[0] // tile,)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((digits.shape[0], 2, N), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, rows, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((len(primes), rows, 2 * BK_LIMBS, N), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                *table_specs,
            ],
            out_specs=pl.BlockSpec((tile, 2, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(digits, bk_round, *(jnp.asarray(a) for a in table_args))
        return out[:m]

    return run


def make_full_round_kernel(params: TfheParams, plan: NttPlan, tile: int = 32,
                           interpret: bool = False):
    """Whole-CMUX-round kernel: rotate -> diff -> decompose -> external
    product -> accumulate, per VMEM tile.

    ``fn(acc [M,2,N], t [M] int32 in [0,2N), bk int32 [P,rows,8,N]) -> acc'``.

    The per-round HBM traffic collapses to acc in/out + the BK slice; the
    rotation (the dominant XLA cost per the device trace: ~40% in
    compare_select fusions) becomes VPU work on VMEM-resident data.
    """
    inner = make_round_kernel(params, plan, tile=tile, interpret=interpret)
    primes = plan.primes
    rows = params.decomp_rows
    N = params.N
    R = N // 128
    l = params.l
    bg_bit = params.bg_bit
    half_bg = params.half_bg
    mask_mod = params.bg - 1
    log2_2n = params.log2_2N
    offset = 0
    for j in range(l):
        offset = (offset + (half_bg << (32 - (j + 1) * bg_bit))) & 0xFFFFFFFF
    offset = offset - (1 << 32) if offset >= (1 << 31) else offset
    tabs = _round_tables(params, plan)
    dec_shifts = [32 - (j + 1) * bg_bit for j in range(l)]

    def _rot_pow2(x, k):
        """x [T,2,R,128] -> X^(2^k) * x (negacyclic), static k."""
        s = 1 << k
        if s >= N:  # X^N = -1; X^2N = 1
            return -x if (s // N) % 2 == 1 else x
        if s >= 128:
            sr = s // 128
            rolled = pltpu.roll(x, sr, axis=2)
            row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
            return jnp.where(row < sr, -rolled, rolled)
        lane_roll = pltpu.roll(x, s, axis=3)
        carried = pltpu.roll(lane_roll, 1, axis=2)
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
        carried = jnp.where(row == 0, -carried, carried)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 3)
        return jnp.where(lane < s, carried, lane_roll)

    def kernel(acc_ref, t_ref, bk_ref, tw_ref, un_ref, twd_ref, twdi_ref,
               wc_lo_ref, wc_hi_ref, wci_lo_ref, wci_hi_ref,
               wr_ref, wri_ref, out_ref):
        acc = acc_ref[:]  # [T, 2, N]
        T = acc.shape[0]
        a4 = acc.reshape(T, 2, R, 128)
        rot = a4
        tcol = t_ref[:]  # [T, 1]
        for k in range(log2_2n):
            rx = _rot_pow2(rot, k)
            bit = ((tcol >> k) & 1).reshape(T, 1, 1, 1) != 0
            rot = jnp.where(bit, rx, rot)
        diff = (rot - a4).reshape(T, 2, N)
        # signed gadget decomposition (int32 wraparound == uint32 semantics)
        u = diff + np.int32(offset)
        digs = []
        for j in range(l):
            digs.append(((u >> dec_shifts[j]) & np.int32(mask_mod)) - np.int32(half_bg))
        digits = jnp.stack(digs, axis=2).reshape(T, rows, N)  # [T,2,l,N]->rows
        delta = _external_tile(digits, bk_ref, tw_ref, un_ref, twd_ref, twdi_ref,
                               wc_lo_ref, wc_hi_ref, wci_lo_ref, wci_hi_ref,
                               wr_ref, wri_ref)
        out_ref[:] = acc + delta

    # reuse the external-product body from make_round_kernel by rebuilding it
    # here as a function of loaded refs
    p0, p1 = primes
    inv01 = pow(p0 % p1, p1 - 2, p1)
    Pm32 = (p0 * p1) & 0xFFFFFFFF
    Pm32 = Pm32 - (1 << 32) if Pm32 >= (1 << 31) else Pm32

    def _external_tile(digits, bk_ref, tw_ref, un_ref, twd_ref, twdi_ref,
                       wc_lo_ref, wc_hi_ref, wci_lo_ref, wci_hi_ref,
                       wr_ref, wri_ref):
        T = digits.shape[0]
        convs = []
        for pi, p in enumerate(primes):
            dmod = digits + np.int32(p) * (digits < 0).astype(jnp.int32)
            v = dmod.reshape(T * rows, R, 128)
            v = _mulmod(v, tw_ref[pi][None], p)
            outs = []
            for k1 in range(R):
                accv = None
                for j1 in range(R):
                    tt = _mulmod(v[:, j1, :], wr_ref[pi, k1, j1], p)
                    accv = tt if accv is None else accv + tt
                outs.append(_reduce(accv, p))
            a = jnp.stack(outs, axis=1)
            a = _mulmod(a, twd_ref[pi][None], p)
            z = _exact_dot_mod(a.reshape(-1, 128),
                               wc_lo_ref[pi].astype(jnp.bfloat16),
                               wc_hi_ref[pi].astype(jnp.bfloat16), p)
            dn = z.reshape(T, rows, N)
            group = max(1, (2**31 - 1) // ((p - 1) ** 2))
            souts = []
            for ol in range(2 * BK_LIMBS):
                total = None
                accv = None
                cnt = 0
                for j in range(rows):
                    prod = dn[:, j, :] * bk_ref[pi, j, ol, :][None, :]
                    accv = prod if accv is None else accv + prod
                    cnt += 1
                    if cnt == group or j == rows - 1:
                        red = _reduce(accv, p)
                        total = red if total is None else total + red
                        accv, cnt = None, 0
                souts.append(_reduce(total, p))
            sarr = jnp.stack(souts, axis=1)  # [T, 8, N]
            b = _exact_dot_mod(sarr.reshape(-1, 128),
                               wci_lo_ref[pi].astype(jnp.bfloat16),
                               wci_hi_ref[pi].astype(jnp.bfloat16),
                               p).reshape(-1, R, 128)
            b = _mulmod(b, twdi_ref[pi][None], p)
            outs = []
            for j1 in range(R):
                accv = None
                for k1 in range(R):
                    tt = _mulmod(b[:, k1, :], wri_ref[pi, j1, k1], p)
                    accv = tt if accv is None else accv + tt
                outs.append(_reduce(accv, p))
            xarr = jnp.stack(outs, axis=1)
            xarr = _mulmod(xarr, un_ref[pi][None], p)
            convs.append(xarr.reshape(T, 2 * BK_LIMBS, N))
        c0, c1 = convs
        diffc = c1 - _reduce(c0, p1)
        diffc = jnp.where(diffc < 0, diffc + p1, diffc)
        t1 = _mulmod(diffc, jnp.int32(inv01), p1)
        vraw = c0 + t1 * np.int32(p0)
        frac = (c0.astype(jnp.float32) * np.float32(1.0 / (p0 * p1))
                + t1.astype(jnp.float32) * np.float32(1.0 / p1))
        vv = vraw - jnp.where(frac >= 0.5, np.int32(Pm32), np.int32(0))
        delta = []
        for o in range(2):
            accum = vv[:, o * BK_LIMBS, :]
            for li in range(1, BK_LIMBS):
                accum = accum + vv[:, o * BK_LIMBS + li, :] * np.int32(1 << (8 * li))
            delta.append(accum)
        return jnp.stack(delta, axis=1)

    n_tabs = len(primes)
    tw = np.stack([t["twist"] for t in tabs])
    un = np.stack([t["untwist"] for t in tabs])
    twd = np.stack([t["TW"] for t in tabs])
    twdi = np.stack([t["TWi"] for t in tabs])
    wc_lo = np.stack([t["WC"][0] for t in tabs])
    wc_hi = np.stack([t["WC"][1] for t in tabs])
    wci_lo = np.stack([t["WCi"][0] for t in tabs])
    wci_hi = np.stack([t["WCi"][1] for t in tabs])
    wr = np.stack([t["WR"] for t in tabs])
    wri = np.stack([t["WRi"] for t in tabs])
    table_args = (tw, un, twd, twdi, wc_lo, wc_hi, wci_lo, wci_hi, wr, wri)
    table_specs = [
        pl.BlockSpec((n_tabs, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tabs, R, R), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((n_tabs, R, R), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
    ]

    def run(acc, t, bk_round):
        m = acc.shape[0]
        pad = (-m) % tile
        if pad:
            acc = jnp.concatenate([acc, jnp.zeros((pad, 2, N), jnp.int32)], axis=0)
            t = jnp.concatenate([t, jnp.zeros((pad,), jnp.int32)], axis=0)
        grid = (acc.shape[0] // tile,)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((acc.shape[0], 2, N), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, 2, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((len(primes), rows, 2 * BK_LIMBS, N), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                *table_specs,
            ],
            out_specs=pl.BlockSpec((tile, 2, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(acc, t.reshape(-1, 1), bk_round, *(jnp.asarray(a) for a in table_args))
        return out[:m]

    return run
