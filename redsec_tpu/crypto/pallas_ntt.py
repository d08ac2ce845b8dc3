"""Pallas TPU kernel: fused negacyclic NTT (all stages in one VMEM-resident pass).

The XLA formulation of the NTT (crypto/ntt.py) materializes each butterfly
stage through HBM and pays lane-relayout costs in the late stages (half-width
h < 128).  This kernel keeps a tile of polynomials in VMEM for all log2(N)
stages; the fp32-reciprocal modular multiply is identical to the XLA path, so
results are bit-exact.

Layout trick: a [T, N] tile is viewed as [T * (N / 2h), 2h] per stage by a
reshape — the butterfly then always operates on contiguous halves with the
pair axis in the sublane dimension, avoiding per-lane shuffles until the last
log2(128) stages (which run on [.., 2h <= 128] rows).

Used behind a flag (REDSEC_PALLAS_NTT=1) until profiled as a clear win.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt import NttPlan


def _mulmod(a, b, p: int):
    prod = a * b
    q = jnp.floor(a.astype(jnp.float32) * b.astype(jnp.float32) * np.float32(1.0 / p))
    r = prod - q.astype(jnp.int32) * np.int32(p)
    r = jnp.where(r < 0, r + p, r)
    return jnp.where(r >= p, r - p, r)


def _pack_tables(plan: NttPlan, pi: int, inverse: bool) -> np.ndarray:
    """Twiddles as one [2, N] int32 input: row 0 = twist/untwist, row 1 = the
    per-stage tables concatenated (Pallas kernels cannot capture constants)."""
    N = plan.N
    stages = N.bit_length() - 1
    row0 = (plan.untwist if inverse else plan.twist)[pi].astype(np.int32)
    tabs = (plan.inv_tabs if inverse else plan.fwd_tabs)[pi]
    row1 = np.zeros(N, dtype=np.int32)
    off = 0
    for s in range(stages):
        t = tabs[s].astype(np.int32)
        row1[off : off + len(t)] = t
        off += len(t)
    return np.stack([row0, row1])


def _stage_offsets(plan: NttPlan, inverse: bool):
    N = plan.N
    stages = N.bit_length() - 1
    offs, off = [], 0
    for s in range(stages):
        size = (1 << s) if inverse else (N >> (s + 1))
        offs.append((off, size))
        off += size
    return offs


def _make_fwd_kernel(plan: NttPlan, pi: int, tile: int):
    p = plan.primes[pi]
    N = plan.N
    stages = N.bit_length() - 1
    offs = _stage_offsets(plan, inverse=False)

    def kernel(x_ref, tw_ref, o_ref):
        arr = _mulmod(x_ref[:], tw_ref[0, :][None, :], p)
        for s in range(stages):
            m, h = 1 << s, N >> (s + 1)
            v = arr.reshape(tile * m, 2, h)
            a, b = v[:, 0, :], v[:, 1, :]
            o0, sz = offs[s]
            w = tw_ref[1, o0 : o0 + sz][None, :]
            s0 = a + b
            s0 = jnp.where(s0 >= p, s0 - p, s0)
            d = a - b
            d = jnp.where(d < 0, d + p, d)
            s1 = _mulmod(d, w, p)
            arr = jnp.stack([s0, s1], axis=1).reshape(tile, N)
        o_ref[:] = arr

    return kernel


def _make_inv_kernel(plan: NttPlan, pi: int, tile: int):
    p = plan.primes[pi]
    N = plan.N
    stages = N.bit_length() - 1
    offs = _stage_offsets(plan, inverse=True)

    def kernel(x_ref, tw_ref, o_ref):
        arr = x_ref[:]
        for s in range(stages):
            m, h = N >> (s + 1), 1 << s
            v = arr.reshape(tile * m, 2, h)
            a, b = v[:, 0, :], v[:, 1, :]
            o0, sz = offs[s]
            t = _mulmod(b, tw_ref[1, o0 : o0 + sz][None, :], p)
            s0 = a + t
            s0 = jnp.where(s0 >= p, s0 - p, s0)
            s1 = a - t
            s1 = jnp.where(s1 < 0, s1 + p, s1)
            arr = jnp.concatenate([s0, s1], axis=-1).reshape(tile, N)
        o_ref[:] = _mulmod(arr, tw_ref[0, :][None, :], p)

    return kernel


_CACHE = {}


def _build(plan: NttPlan, pi: int, tile: int, inverse: bool, interpret: bool):
    key = (plan.N, plan.primes, pi, tile, inverse, interpret)
    if key in _CACHE:
        return _CACHE[key]
    fn = _build_uncached(plan, pi, tile, inverse, interpret)
    _CACHE[key] = fn
    return fn


def _build_uncached(plan: NttPlan, pi: int, tile: int, inverse: bool, interpret: bool):
    maker = _make_inv_kernel if inverse else _make_fwd_kernel
    kernel = maker(plan, pi, tile)
    N = plan.N
    tables = jnp.asarray(_pack_tables(plan, pi, inverse))

    def call(x):  # [M, N] with M % tile == 0
        grid = (x.shape[0] // tile,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, tables)

    return call


def ntt_pallas(x, plan: NttPlan, pi: int, tile: int = 256, inverse: bool = False,
               interpret: bool = False):
    """Batched NTT via the fused Pallas kernel; x int32 [..., N] in [0, p)."""
    shape = x.shape
    flat = x.reshape(-1, plan.N)
    m = flat.shape[0]
    pad = (-m) % tile
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, plan.N), jnp.int32)])
    out = _build(plan, pi, tile, inverse, interpret)(flat)
    return out[:m].reshape(shape)
