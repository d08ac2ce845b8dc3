"""Whole-blind-rotation Pallas mega-kernel.

The XLA (and per-round-kernel) formulations round-trip the accumulator and
digit tensors through HBM every one of the n=350 CMUX rounds; on this backend
that traffic is the bootstrap bottleneck (the rotation stage alone measures
~1.9 ms/round at batch 512 — a fixed per-pass memory floor).

This kernel runs the ENTIRE blind rotation as one ``pallas_call`` with grid
``(batch_tiles, n)``:

- the accumulator lives in the output VMEM block, revisited across all n
  round steps (index map ignores the round index, so Mosaic keeps it
  resident and flushes once per batch tile);
- the bootstrapping key streams through VMEM one round-slice at a time
  (int16 residues, double-buffered by the pipeline);
- rotation is ``log2(2N)`` conditional VMEM rolls (no HBM relayouts);
- the external product (NTT -> pointwise -> INTT -> CRT) is the same
  bit-exact int32 + fp32-reciprocal arithmetic as crypto/ntt.py, with the
  128-lane DFT stages as bf16-limb MXU matmuls (crypto/ntt_matmul.py's
  exactness argument).

Per-round HBM traffic collapses to the 655 KB BK slice; acc I/O happens once
per batch tile. Role in the reference: this is the ``tfhe_bootstrap_FFT``
hot loop (lib/BinOps_enc.cpp:182-186) fused end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ntt_matmul
from .ntt import NttPlan
from .params import TfheParams
from .pallas_round import BK_LIMBS, _exact_dot_mod, _mulmod, _reduce, _round_tables


def supported(params: TfheParams, plan: NttPlan) -> bool:
    return (
        len(plan.primes) == 2
        and all(p < (1 << 15) for p in plan.primes)
        and ntt_matmul.supported(params.N)
        and ntt_matmul._split_rc(params.N)[1] == 128
    )


def pack_bk_int16(bk_ntt) -> jax.Array:
    """Stack the per-prime uint16 BK tensors [n, rows, 2, limbs, N] into the
    kernel streaming layout int16 [P, n, rows, 2*limbs, N] (device-side)."""
    parts = []
    for bk in bk_ntt:
        n, rows = bk.shape[0], bk.shape[1]
        parts.append(bk.reshape(n, rows, -1, bk.shape[-1]).astype(jnp.int16))
    return jnp.stack(parts)


def make_blind_rotate_kernel(params: TfheParams, plan: NttPlan, tile: int = 64,
                             interpret: bool = False):
    """Build ``fn(acc0 [B,2,N] int32, abar [B,n] int32, bk int16
    [P,n,rows,8,N]) -> acc [B,2,N]`` running all n rounds in one kernel."""
    primes = plan.primes
    P = len(primes)
    rows = params.decomp_rows
    N = params.N
    n = params.n
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

    p0, p1 = primes
    inv01 = pow(p0 % p1, p1 - 2, p1)
    Pm32 = (p0 * p1) & 0xFFFFFFFF
    Pm32 = Pm32 - (1 << 32) if Pm32 >= (1 << 31) else Pm32

    def _rot_pow2(x, k):
        """x [T,2,R,128] -> X^(2^k) * x (negacyclic), static k."""
        s = 1 << k
        if s >= N:  # X^N = -1
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

    def _external(digits, bk, tw_ref, un_ref, twd_ref, twdi_ref,
                  wc_lo_ref, wc_hi_ref, wci_lo_ref, wci_hi_ref,
                  wr_ref, wri_ref):
        """digits [T, rows, N] int32 -> delta [T, 2, N] torus int32.
        bk: int32 [P, rows, 8, N] (this round's key slice)."""
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
                    prod = dn[:, j, :] * bk[pi, j, ol, :][None, :]
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

    def kernel(abar_ref, acc0_ref, bk_ref, tw_ref, un_ref, twd_ref, twdi_ref,
               wc_lo_ref, wc_hi_ref, wci_lo_ref, wci_hi_ref,
               wr_ref, wri_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[:] = acc0_ref[:]

        acc = out_ref[:]  # [T, 2, N]
        T = acc.shape[0]
        a4 = acc.reshape(T, 2, R, 128)
        rot = a4
        # abar block is the full [T, n] row (Pallas requires the trailing
        # block dims to be (8,128)-divisible or whole); select round j's
        # column with a masked reduction — lane-dynamic slices may not lower
        ncols = abar_ref.shape[1]
        colmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1) == j
        ).astype(jnp.int32)
        tcol = (abar_ref[:] * colmask).sum(axis=1, keepdims=True)  # [T, 1]
        for k in range(log2_2n):
            rx = _rot_pow2(rot, k)
            bit = ((tcol >> k) & 1).reshape(T, 1, 1, 1) != 0
            rot = jnp.where(bit, rx, rot)
        diff = (rot - a4).reshape(T, 2, N)
        u = diff + np.int32(offset)
        digs = []
        for jj in range(l):
            digs.append(((u >> dec_shifts[jj]) & np.int32(mask_mod)) - np.int32(half_bg))
        digits = jnp.stack(digs, axis=2).reshape(T, rows, N)
        bk = bk_ref[:, 0].astype(jnp.int32)  # [P, rows, 8, N]
        delta = _external(digits, bk, tw_ref, un_ref, twd_ref, twdi_ref,
                          wc_lo_ref, wc_hi_ref, wci_lo_ref, wci_hi_ref,
                          wr_ref, wri_ref)
        out_ref[:] = acc + delta

    n_tabs = P
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
    tab3 = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    table_specs = [
        tab3((n_tabs, R, 128)), tab3((n_tabs, R, 128)),
        tab3((n_tabs, R, 128)), tab3((n_tabs, R, 128)),
        tab3((n_tabs, 128, 128)), tab3((n_tabs, 128, 128)),
        tab3((n_tabs, 128, 128)), tab3((n_tabs, 128, 128)),
        pl.BlockSpec((n_tabs, R, R), lambda i, j: (0, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((n_tabs, R, R), lambda i, j: (0, 0, 0), memory_space=pltpu.SMEM),
    ]

    def run(acc0, abar, bk16):
        """acc0 [B,2,N] int32; abar [B,n] int32 in [0,2N); bk16 int16
        [P,n,rows,8,N] -> [B,2,N]."""
        m = acc0.shape[0]
        pad = (-m) % tile
        if pad:
            acc0 = jnp.concatenate([acc0, jnp.zeros((pad, 2, N), jnp.int32)], axis=0)
            abar = jnp.concatenate([abar, jnp.zeros((pad, n), jnp.int32)], axis=0)
        grid = (acc0.shape[0] // tile, n)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((acc0.shape[0], 2, N), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 2, N), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1, rows, 2 * BK_LIMBS, N), lambda i, j: (0, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                *table_specs,
            ],
            out_specs=pl.BlockSpec((tile, 2, N), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(abar, acc0, bk16, *(jnp.asarray(a) for a in table_args))
        return out[:m]

    return run
